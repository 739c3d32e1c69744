"""Probe the per-op dispatch floor of the chained-scan benchmark harness
and re-measure the SWAR GEMM at M=2048 (dev tool)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import ml_dtypes
    from qutlass_tpu.profiling import benchmark, tflops, enable_compile_cache
    from qutlass_tpu.ops import pallas_ops as P

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 256)).astype(ml_dtypes.bfloat16))

    def tiny(d):
        return x + d.astype(jnp.bfloat16)

    # floor structure: per chained application or per scan iteration?
    for it, ch in [(8, 1), (8, 8), (8, 32), (64, 1)]:
        t = benchmark(tiny, iters=it, chain=ch)
        print(f"tiny add iters={it:3d} chain={ch:3d}: {t*1e6:8.1f} us/app",
              flush=True)

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

    M = 2048
    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                   layout="kmajor")

    def gemm_only(d):
        q = aqt + d.astype(jnp.uint8)[0]
        return P.matmul_mxf4_bf16_kmajor(q, wqt, ast, wst, one)

    def quantize_only(d):
        xx = a + d.astype(jnp.bfloat16)
        return P.fused_quantize_mx(xx, h, rot_size=32, method="quest",
                                   layout="kmajor")[0]

    def bf16(d):
        return (a + d.astype(jnp.bfloat16)) @ wT

    tg = benchmark(gemm_only)
    tq = benchmark(quantize_only)
    tb = benchmark(bf16)
    print(f"M={M} gemm {tg*1e6:8.1f}us ({tflops(M,N,K,tg):6.1f}TF) "
          f"quant {tq*1e6:8.1f}us bf16 {tb*1e6:8.1f}us "
          f"({tflops(M,N,K,tb):6.1f}TF) gemm/bf16 {tb/tg:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
