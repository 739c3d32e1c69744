"""Skeleton sweep round 2: orientations x tiles around the 618us winner.

Orientations: lhs m-major [bm,bk] vs k-major [bk,bm]; rhs k-major
[bk,bn] vs n-major [bn,bk].  bk=512 entries compare against their own
bk's reference (accumulation order differs across bk, so cross-bk
outputs differ in ulps — not a correctness signal).
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from qutlass_tpu.profiling import (benchmark, chain_dep, tflops,
                                       enable_compile_cache)
    from qutlass_tpu.utils import ceil_div

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    N, K, M = 5120, 5120, 2048
    NW = 4
    wk, wn = [], []
    for _ in range(NW):
        w = rng.standard_normal((K, N)) * 0.05
        wk.append(jnp.asarray(w.astype(ml_dtypes.bfloat16)))        # [K, N]
        wn.append(jnp.asarray(w.T.copy().astype(ml_dtypes.bfloat16)))  # [N, K]
    params = {"wk": wk, "wn": wn}
    a_np = rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16)
    a_mm = jnp.asarray(a_np)            # [M, K]
    a_km = jnp.asarray(a_np.T.copy())   # [K, M]

    def make(bm, bn, bk, am, bn_major):
        ca = 1 if am else 0
        cb = 1 if bn_major else 0
        dims = (((ca,), (cb,)), ((), ()))

        def kern(a_ref, b_ref, o_ref, acc):
            @pl.when(pl.program_id(2) == 0)
            def _init():
                acc[...] = jnp.zeros_like(acc)
            acc[...] += jax.lax.dot_general(
                a_ref[...], b_ref[...], dims,
                preferred_element_type=jnp.float32)
            @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
            def _fin():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        a_spec = (pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                               memory_space=pltpu.VMEM) if am else
                  pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i),
                               memory_space=pltpu.VMEM))
        b_spec = (pl.BlockSpec((bn, bk), lambda i, j, kk: (j, kk),
                               memory_space=pltpu.VMEM) if bn_major else
                  pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                               memory_space=pltpu.VMEM))

        @jax.jit
        def run(at, bt):
            return pl.pallas_call(
                kern,
                grid=(ceil_div(M, bm), ceil_div(N, bn), K // bk),
                in_specs=[a_spec, b_spec],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(at, bt)
        return run

    cases = [
        # (bm, bn, bk, a_mmajor, b_nmajor)
        (512, 2560, 256, True, False),
        (512, 2560, 256, True, True),
        (512, 2560, 256, False, True),
        (512, 2560, 512, True, False),
        (512, 1280, 256, True, False),
        (768, 1536, 256, True, False),
        (1024, 2048, 256, True, False),
        (512, 2048, 256, True, False),
        (640, 2560, 256, True, False),
        (512, 2560, 320, True, False),
        (1024, 1280, 256, True, False),
        (2048, 1024, 256, True, False),
    ]
    refs = {}
    for bm, bn, bk, am, bnm in cases:
        av = a_mm if am else a_km
        try:
            run = make(bm, bn, bk, am, bnm)

            def op(d, j, p, _r=run, _av=av, _bnm=bnm):
                b = p["wn"][j % NW] if _bnm else p["wk"][j % NW]
                return _r(chain_dep(_av, d), b)

            out = np.asarray(op(jnp.zeros((), jnp.float32), 0, params))
            if bk in refs:
                assert np.array_equal(out, refs[bk]), "MISMATCH"
            else:
                refs[bk] = out
            t = benchmark(op, params=params)
            print(f"a={'m' if am else 'k'} b={'n' if bnm else 'k'} "
                  f"bm={bm:4d} bn={bn:4d} bk={bk:4d}: {t*1e6:7.1f}us "
                  f"({tflops(M,N,K,t):5.1f}TF)", flush=True)
        except Exception as e:
            print(f"a={'m' if am else 'k'} b={'n' if bnm else 'k'} "
                  f"bm={bm:4d} bn={bn:4d} bk={bk:4d}: FAIL {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
