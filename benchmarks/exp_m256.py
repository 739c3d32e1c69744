"""On-TPU probe: M=256 GEMM bk sweep + quantize-only cost across M.

M=256 GEMM runs 91 us vs a 68 us MXU floor and is skeleton-bound
(fake-decode ~= real).  Deeper bk cuts grid steps 20 -> 5.  Also time
the fused quantize kernel alone at each bench M to see how much of the
small-M end-to-end is quantize vs GEMM vs glue.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.kernels import gemm as KG
    from qutlass_tpu.profiling import (benchmark, chain_dep, tflops,
                                       enable_compile_cache)
    from qutlass_tpu.ops import pallas_ops as P

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    N, K = 5120, 5120
    NW = 4
    wqts, wsts = [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
    params = {"wqt": wqts, "wst": wsts}

    # quantize-only across the bench sweep
    for M in [16, 64, 256, 1024, 2048]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))

        def quant(d):
            return P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                       method="quest", layout="kmajor")[0]

        t = benchmark(quant)
        print(f"M={M:5d} quantize-only: {t*1e6:7.1f}us", flush=True)

    # GEMM bk sweep at M=256
    M = 256
    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                   layout="kmajor")
    ref = None
    orig = KG.gemm_tiles
    for bk in (256, 512, 1024):
        KG.gemm_tiles = lambda m, n, k, packed, _t=(256, 5120, bk): _t
        KG.matmul_mxf4_bf16_kmajor.clear_cache()

        def gemm(d, j, p):
            return KG.matmul_mxf4_bf16_kmajor(chain_dep(aqt, d),
                                              p["wqt"][j % NW], ast,
                                              p["wst"][j % NW], one)

        try:
            out = np.asarray(gemm(jnp.zeros((), jnp.float32), 0, params))
            if ref is None:
                ref = out
            t = benchmark(gemm, params=params)
            print(f"M=256 bk={bk:5d}: {t*1e6:7.1f}us "
                  f"({tflops(M,N,K,t):5.1f}TF)", flush=True)
        except Exception as e:
            print(f"M=256 bk={bk:5d}: FAIL {str(e)[:120]}", flush=True)
        finally:
            KG.gemm_tiles = orig


if __name__ == "__main__":
    main()
