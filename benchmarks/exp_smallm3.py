"""On-TPU probe: small-M end-to-end composition.

e2e (bench.py) at M=64 is ~56 us but quantize-only measures 8.5 and
GEMM-only ~28 — locate the remaining ~19 us: re-measure GEMM-only,
quantize-only, quantize+GEMM composed, and composed+sum (the bench's
chain reduction) under one harness.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.profiling import (benchmark, chain_dep, tflops,
                                       enable_compile_cache)
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.kernels import gemm as KG

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    N, K = 5120, 5120
    NW = 8
    wqts, wsts = [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
    params = {"wqt": wqts, "wst": wsts}

    for M in [16, 64]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")

        def gemm_only(d, j, p):
            return KG.matmul_mxf4_bf16_kmajor(chain_dep(aqt, d),
                                              p["wqt"][j % NW], ast,
                                              p["wst"][j % NW], one)

        def quant_only(d):
            return P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                       method="quest", layout="kmajor")[0]

        def composed(d, j, p):
            x = chain_dep(a, d)
            xqt, xst = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                           layout="kmajor")
            return KG.matmul_mxf4_bf16_kmajor(xqt, p["wqt"][j % NW], xst,
                                              p["wst"][j % NW], one)

        tg = benchmark(gemm_only, params=params)
        tq = benchmark(quant_only)
        tc = benchmark(composed, params=params)
        print(f"M={M:3d}: gemm {tg*1e6:6.1f}us  quant {tq*1e6:6.1f}us  "
              f"composed {tc*1e6:6.1f}us  (sum parts {1e6*(tg+tq):6.1f})",
              flush=True)


if __name__ == "__main__":
    main()
