"""Minimal on-TPU probe: kmajor GEMM + quantize at M=2048 (dev tool)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import (benchmark, chain_dep, tflops,
                                       enable_compile_cache)

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    M, N, K = 2048, 5120, 5120
    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    w = jnp.asarray((rng.standard_normal((N, K)) * 0.05).astype(ml_dtypes.bfloat16))
    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                   layout="kmajor")
    params = {"wqt": wqt, "wst": wst, "aqt": aqt, "ast": ast, "a": a}

    def gemm(d, p):
        return P.matmul_mxf4_bf16_kmajor(chain_dep(p["aqt"], d), p["wqt"],
                                         p["ast"], p["wst"], one)

    def quant(d, p):
        return P.fused_quantize_mx(chain_dep(p["a"], d), h, rot_size=32,
                                   method="quest", layout="kmajor")[0]

    def e2e_codes(d, p):
        x = chain_dep(p["a"], d)
        xq, xs = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        return P.matmul_mxf4_bf16_kmajor_codes(xq, p["wqt"], xs, p["wst"],
                                               one)

    def e2e_packed(d, p):
        x = chain_dep(p["a"], d)
        xq, xs = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                     layout="kmajor")
        return P.matmul_mxf4_bf16_kmajor(xq, p["wqt"], xs, p["wst"], one)

    tg = benchmark(gemm, params=params)
    tq = benchmark(quant, params=params)
    tc = benchmark(e2e_codes, params=params)
    tp = benchmark(e2e_packed, params=params)
    print(f"M={M} gemm {tg*1e6:8.1f}us ({tflops(M,N,K,tg):6.1f}TF) "
          f"quant {tq*1e6:8.1f}us e2e-codes {tc*1e6:8.1f}us "
          f"e2e-packed {tp*1e6:8.1f}us", flush=True)


if __name__ == "__main__":
    main()
