"""Probe: int8 MXU throughput vs bf16 on this TPU (VERDICT r1 #2).

Questions:
  1. XLA int8[M,K] @ int8[K,N] -> int32: how fast vs bf16 matmul?
  2. Does Mosaic lower an int8 dot inside a Pallas kernel, and at what
     rate?
  3. Cost of the per-K-block fp32 scale fixup (the two-level MXFP4
     scheme: block-max exponents absorbed into shifted int8 mantissas,
     rank-1 pow2 scale applied to each block's int32 partial sum).

Run:  python benchmarks/exp_int8.py
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache, tflops

enable_compile_cache()

M, N, K = 2048, 5120, 5120
BM, BN, BK = 256, 512, 512

_KDIM = (((0,), (0,)), ((), ()))


def report(name, sec):
    print(f"{name:34s} {sec*1e6:9.1f} us   {tflops(M, N, K, sec):7.1f} TF/s")


# ---------------------------------------------------------------- baselines
def bf16_op(dep, j, p):
    a = chain_dep(p["a_bf"][j % 2], dep)
    return jax.lax.dot_general(a, p["b_bf"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def int8_xla_op(dep, j, p):
    # chain_dep on int8: max against a tiny value cast to int8
    d = dep.reshape(()).astype(jnp.float32)
    a = jnp.maximum(p["a_i8"][j % 2], (d * 1e-30 - 127.0).astype(jnp.int8))
    return jax.lax.dot_general(a, p["b_i8"], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


# ------------------------------------------------------------- pallas int8
def _int8_kernel(a_ref, b_ref, o_ref, acc):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(a_ref[...], b_ref[...], _KDIM,
                                    preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _fin():
        o_ref[...] = acc[...]


def _int8_scaled_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc):
    """Per-K-block rank-1 fp32 scale fixup on the int32 partial sum."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    p = jax.lax.dot_general(a_ref[...], b_ref[...], _KDIM,
                            preferred_element_type=jnp.int32)
    kk = pl.program_id(2)
    sa = sa_ref[kk, :]                     # [bm] fp32 pow2 block scales
    sb = sb_ref[kk, :]                     # [bn]
    acc[...] += p.astype(jnp.float32) * (sa[:, None] * sb[None, :])

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _fin():
        o_ref[...] = acc[...].astype(jnp.bfloat16)


@jax.jit
def pallas_int8(at, bt):
    grid = (M // BM, N // BN, K // BK)
    return pl.pallas_call(
        _int8_kernel, grid=grid,
        in_specs=[pl.BlockSpec((BK, BM), lambda i, j, kk: (kk, i)),
                  pl.BlockSpec((BK, BN), lambda i, j, kk: (kk, j))],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(at, bt)


@jax.jit
def pallas_int8_scaled(at, bt, sa, sb):
    grid = (M // BM, N // BN, K // BK)
    return pl.pallas_call(
        _int8_scaled_kernel, grid=grid,
        in_specs=[pl.BlockSpec((BK, BM), lambda i, j, kk: (kk, i)),
                  pl.BlockSpec((BK, BN), lambda i, j, kk: (kk, j)),
                  pl.BlockSpec((K // BK, BM), lambda i, j, kk: (0, i)),
                  pl.BlockSpec((K // BK, BN), lambda i, j, kk: (0, j))],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(at, bt, sa, sb)


def main():
    print(f"backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}  M={M} N={N} K={K}")
    rng = np.random.default_rng(0)
    params = {
        "a_bf": jnp.asarray(rng.standard_normal((2, M, K)), jnp.bfloat16),
        "b_bf": jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16),
        "a_i8": jnp.asarray(rng.integers(-96, 97, (2, M, K)), jnp.int8),
        "b_i8": jnp.asarray(rng.integers(-96, 97, (K, N)), jnp.int8),
    }

    t = benchmark(bf16_op, params=params)
    report("XLA bf16 matmul", t)
    try:
        t = benchmark(int8_xla_op, params=params)
        report("XLA int8->int32 matmul", t)
    except Exception as e:
        print("XLA int8 FAILED:", repr(e)[:300])

    # K-major int8 operands for the pallas kernels
    params_p = {
        "at": jnp.asarray(rng.integers(-96, 97, (2, K, M)), jnp.int8),
        "bt": jnp.asarray(rng.integers(-96, 97, (K, N)), jnp.int8),
        "sa": jnp.asarray(
            np.exp2(rng.integers(-8, 8, (K // BK, M))).astype(np.float32)),
        "sb": jnp.asarray(
            np.exp2(rng.integers(-8, 8, (K // BK, N))).astype(np.float32)),
    }

    def pallas_op(dep, j, p):
        d = dep.reshape(()).astype(jnp.float32)
        a = jnp.maximum(p["at"][j % 2], (d * 1e-30 - 127.0).astype(jnp.int8))
        return pallas_int8(a, p["bt"])

    def pallas_scaled_op(dep, j, p):
        d = dep.reshape(()).astype(jnp.float32)
        a = jnp.maximum(p["at"][j % 2], (d * 1e-30 - 127.0).astype(jnp.int8))
        return pallas_int8_scaled(a, p["bt"], p["sa"], p["sb"])

    try:
        out = pallas_int8(params_p["at"][0], params_p["bt"])
        ref = jax.lax.dot_general(
            params_p["at"][0].astype(jnp.int32).T,
            params_p["bt"].astype(jnp.int32), (((1,), (0,)), ((), ())))
        ok = bool(jnp.all(out == ref))
        print(f"pallas int8 correct: {ok}")
        t = benchmark(pallas_op, params=params_p)
        report("Pallas int8->int32", t)
    except Exception as e:
        print("Pallas int8 FAILED:", repr(e)[:500])

    try:
        t = benchmark(pallas_scaled_op, params=params_p)
        report("Pallas int8 + fp32 block scales", t)
    except Exception as e:
        print("Pallas int8 scaled FAILED:", repr(e)[:500])


if __name__ == "__main__":
    main()
