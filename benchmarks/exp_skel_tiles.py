"""On-TPU probe: can ANY Pallas skeleton shape match XLA's bf16 matmul?

exp_gemm_anatomy showed the fp4 GEMM gap at M=2048 is the *skeleton*
(grid/DMA/acc), not the decode: bf16 operands through our skeleton run
650 us where XLA's own matmul runs 569.  Sweep tile shapes and the
A-operand orientation (K-major Aᵀ·B vs M-major A·B) on the pure-bf16
skeleton; the winner bounds what the fp4 kernel can reach (decode adds
~20 us on top).
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
    wbts = []
    for _ in range(NW):
        w = rng.standard_normal((K, N)) * 0.05
        wbts.append(jnp.asarray(w.astype(ml_dtypes.bfloat16)))  # [K, N]
    params = {"wbt": wbts}
    a_km = jnp.asarray(rng.standard_normal((K, M)).astype(ml_dtypes.bfloat16))
    a_mm = jnp.asarray(np.asarray(a_km).T.copy())               # [M, K]

    KDIM_T = (((0,), (0,)), ((), ()))   # Aᵀ[K,M] · B[K,N]
    KDIM_N = (((1,), (0,)), ((), ()))   # A[M,K] · B[K,N]

    def make(bm, bn, bk, amajor):
        def kern(a_ref, b_ref, o_ref, acc):
            @pl.when(pl.program_id(2) == 0)
            def _init():
                acc[...] = jnp.zeros_like(acc)
            if amajor == "k":
                acc[...] += jax.lax.dot_general(
                    a_ref[...], b_ref[...], KDIM_T,
                    preferred_element_type=jnp.float32)
            else:
                acc[...] += jax.lax.dot_general(
                    a_ref[...], b_ref[...], KDIM_N,
                    preferred_element_type=jnp.float32)
            @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
            def _fin():
                o_ref[...] = acc[...].astype(jnp.bfloat16)

        a_spec = (pl.BlockSpec((bk, bm), lambda i, j, kk: (kk, i),
                               memory_space=pltpu.VMEM) if amajor == "k" else
                  pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                               memory_space=pltpu.VMEM))

        @jax.jit
        def run(at, bt):
            return pl.pallas_call(
                kern,
                grid=(ceil_div(M, bm), ceil_div(N, bn), K // bk),
                in_specs=[
                    a_spec,
                    pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel", "arbitrary")),
            )(at, bt)
        return run

    shapes = [
        (256, 5120, 256), (512, 2560, 256), (128, 5120, 256),
        (256, 2560, 256), (256, 2560, 512), (512, 1280, 512),
        (256, 1280, 1024), (1024, 1024, 256), (256, 5120, 512),
        (2048, 512, 256),
    ]
    ref = None
    for amajor in ("k", "m"):
        av = a_km if amajor == "k" else a_mm
        for bm, bn, bk in shapes:
            if amajor == "m" and (bm, bn, bk) not in (
                    (256, 5120, 256), (512, 2560, 256), (256, 2560, 512)):
                continue
            try:
                run = make(bm, bn, bk, amajor)
                op = lambda d, j, p: run(chain_dep(av, d), p["wbt"][j % NW])
                out = np.asarray(op(jnp.zeros((), jnp.float32), 0, params))
                if ref is None:
                    ref = out
                else:
                    assert np.array_equal(out, ref), "MISMATCH"
                t = benchmark(op, params=params)
                print(f"a={amajor} bm={bm:4d} bn={bn:4d} bk={bk:4d}: "
                      f"{t*1e6:7.1f}us ({tflops(M,N,K,t):5.1f}TF)", flush=True)
            except Exception as e:
                print(f"a={amajor} bm={bm:4d} bn={bn:4d} bk={bk:4d}: FAIL "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
