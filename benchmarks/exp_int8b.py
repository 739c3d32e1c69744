"""Probe 2: composed XLA int8 GEMM path — epilogue, layouts, M sweep.

The two-level MXFP4 scheme targeted here: per-row base exponents
(Ea[m], Eb[n]) absorb the per-32-group e8m0 scales into 3-bit-shifted
int8 mantissas; the whole-K contraction runs on the int8 MXU and one
rank-1 fp32 fixup scales the int32 result into bf16.

  C[m,n] = (a' @ b'^T)[m,n] * sa[m] * sb[n]

Also: Pallas int8 tile sweep (probe 1 saw only 153 TF/s with
bm/bn/bk = 256/512/512 — is that a tiling artifact or the Mosaic int8
ceiling?).
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qutlass_tpu.profiling import benchmark, enable_compile_cache, tflops

enable_compile_cache()

_KDIM = (((0,), (0,)), ((), ()))


def i8dep(x, dep):
    d = dep.reshape(()).astype(jnp.float32)
    return jnp.maximum(x, (d * 1e-30 - 127.0).astype(jnp.int8))


def report(name, m, n, k, sec):
    print(f"{name:44s} {sec*1e6:9.1f} us   {tflops(m, n, k, sec):7.1f} TF/s",
          flush=True)


def xla_cases(rng, M, N, K):
    params = {
        "a": jnp.asarray(rng.integers(-96, 97, (2, M, K)), jnp.int8),
        "at": jnp.asarray(rng.integers(-96, 97, (2, K, M)), jnp.int8),
        "b": jnp.asarray(rng.integers(-96, 97, (K, N)), jnp.int8),
        "sa": jnp.asarray(np.exp2(rng.integers(-4, 4, (M,))), jnp.float32),
        "sb": jnp.asarray(np.exp2(rng.integers(-4, 4, (N,))), jnp.float32),
        "abf": jnp.asarray(rng.standard_normal((2, M, K)), jnp.bfloat16),
        "bbf": jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16),
    }

    def bf16_op(dep, j, p):
        from qutlass_tpu.profiling import chain_dep
        a = chain_dep(p["abf"][j % 2], dep)
        return jax.lax.dot_general(a, p["bbf"], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot_only(dep, j, p):
        a = i8dep(p["a"][j % 2], dep)
        return jax.lax.dot_general(a, p["b"], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def dot_epilogue(dep, j, p):
        a = i8dep(p["a"][j % 2], dep)
        o = jax.lax.dot_general(a, p["b"], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * p["sa"][:, None] * p["sb"][None, :]
                ).astype(jnp.bfloat16)

    def dot_epilogue_kmajor(dep, j, p):
        a = i8dep(p["at"][j % 2], dep)          # [K, M]
        o = jax.lax.dot_general(a, p["b"], _KDIM,
                                preferred_element_type=jnp.int32)
        return (o.astype(jnp.float32) * p["sa"][:, None] * p["sb"][None, :]
                ).astype(jnp.bfloat16)

    for name, op in [("bf16 baseline", bf16_op),
                     ("int8 dot only", dot_only),
                     ("int8 dot + rank1 scale -> bf16", dot_epilogue),
                     ("int8 dot kmajor-A + epilogue", dot_epilogue_kmajor)]:
        try:
            t = benchmark(op, params=params)
            report(f"XLA {name} M={M}", M, N, K, t)
        except Exception as e:
            print(f"XLA {name} M={M} FAILED: {repr(e)[:200]}")


def _int8_kernel(a_ref, b_ref, o_ref, acc):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(a_ref[...], b_ref[...], _KDIM,
                                    preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _fin():
        o_ref[...] = acc[...]


def pallas_sweep(rng, M, N, K):
    params = {"at": jnp.asarray(rng.integers(-96, 97, (2, K, M)), jnp.int8),
              "bt": jnp.asarray(rng.integers(-96, 97, (K, N)), jnp.int8)}
    for (bm, bn, bk) in [(256, 512, 512), (256, 1024, 512), (512, 1024, 512),
                         (256, 2560, 512), (256, 5120, 256),
                         (256, 5120, 512), (512, 2560, 1024),
                         (256, 1024, 1024), (256, 512, 2048)]:
        if bm > M or bn > N or bk > K:
            continue

        @jax.jit
        def run(at, bt, bm=bm, bn=bn, bk=bk):
            grid = (M // bm, N // bn, K // bk)
            return pl.pallas_call(
                _int8_kernel, grid=grid,
                in_specs=[pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i)),
                          pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j))],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(at, bt)

        def op(dep, j, p):
            return run(i8dep(p["at"][j % 2], dep), p["bt"])

        try:
            t = benchmark(op, params=params)
            report(f"Pallas int8 bm={bm} bn={bn} bk={bk}", M, N, K, t)
        except Exception as e:
            print(f"Pallas bm={bm} bn={bn} bk={bk} FAILED: {repr(e)[:160]}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "xla"
    rng = np.random.default_rng(0)
    if which == "xla":
        for M in (256, 512, 2048):
            xla_cases(rng, M, 5120, 5120)
        xla_cases(rng, 2048, 51200, 5120)
    else:
        pallas_sweep(rng, 2048, 5120, 5120)


if __name__ == "__main__":
    main()
