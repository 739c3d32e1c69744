"""On-TPU experiment: GEMM decode-path variants (dev tool, not a test).

Measures the mxf4 kmajor GEMM and fused linear against the bf16 matmul
at the bench geometry. Run one at a time (remote compiles serialize).
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

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    N, K = 5120, 5120
    w = jnp.asarray((rng.standard_normal((N, K)) * 0.05).astype(ml_dtypes.bfloat16))
    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    wT = w.T

    for M in [16, 256, 2048]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")

        def gemm_only(d):
            return P.matmul_mxf4_bf16_kmajor(chain_dep(aqt, d), wqt, ast,
                                             wst, one)

        def fused(d):
            return P.fused_linear_mxf4(chain_dep(a, d), wqt, wst, h, one,
                                       rot_size=32)

        def bf16(d):
            return chain_dep(a, d) @ wT

        tg = benchmark(gemm_only)
        tf_ = benchmark(fused)
        tb = benchmark(bf16)
        print(f"M={M:5d} gemm {tg*1e6:8.1f}us ({tflops(M,N,K,tg):6.1f}TF) "
              f"fused {tf_*1e6:8.1f}us ({tflops(M,N,K,tf_):6.1f}TF) "
              f"bf16 {tb*1e6:8.1f}us ({tflops(M,N,K,tb):6.1f}TF) "
              f"gemm-speedup {tb/tg:4.2f}x fused-speedup {tb/tf_:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
