"""QAT step component breakdown at 4096^3 (dev tool).

quartet_linear fwd+bwd (nn/linear.py):
  fwd:   fq(x, mask) + fq(w) + mxf4 GEMM
  dgrad: square_double(dY); mxfp4_transpose_mxfp8(wq); mxf8 TN GEMM;
         mask STE; unrotate
  wgrad: mxfp4_transpose_mxfp8(xq); mxf8 NN GEMM; unrotate
"""
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

    M = N = K = 4096
    x = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    w = jnp.asarray((rng.standard_normal((N, K)) * 0.05).astype(ml_dtypes.bfloat16))
    dy = jnp.asarray(rng.standard_normal((M, N)).astype(ml_dtypes.bfloat16))

    xq, xs = P.fused_quantize_mx(x, h, rot_size=32, method="quest")
    wq, ws = P.fused_quantize_mx(w, h, rot_size=32, method="quest")
    gq, g_row, g_col = P.backward_bf16_square_double_mxfp8(dy)
    w8, w8s = P.mxfp4_transpose_mxfp8(wq, ws[:N, :K // 32])
    x8, x8s = P.mxfp4_transpose_mxfp8(xq, xs[:M, :K // 32])
    wT = w.T

    def t_print(name, fn, flops_mnk=None):
        t = benchmark(fn)
        extra = f" ({tflops(*flops_mnk, t):6.1f}TF)" if flops_mnk else ""
        print(f"{name:28s}: {t*1e6:8.1f}us{extra}", flush=True)
        return t

    t_print("bf16 matmul", lambda d: chain_dep(x, d) @ wT, (M, N, K))
    t_print("fq x (quest+mask)",
            lambda d: P.fused_quantize_mx(chain_dep(x, d), h, rot_size=32,
                                          method="quest", return_mask=True)[0])
    t_print("square_double(dY)",
            lambda d: P.backward_bf16_square_double_mxfp8(chain_dep(dy, d))[0])
    t_print("mxfp4_transpose_mxfp8",
            lambda d: P.mxfp4_transpose_mxfp8(chain_dep(wq, d),
                                              ws[:N, :K // 32])[0])
    t_print("mxf8 TN GEMM (dgrad)",
            lambda d: P.matmul_mxf8_bf16_tn(chain_dep(gq, d), w8,
                                            g_row[:gq.shape[0], :N // 32],
                                            w8s, one), (M, K, N))
    t_print("mxf8 NN GEMM (wgrad)",
            lambda d: P.matmul_mxf8_bf16_nn(chain_dep(gq, d), x8,
                                            g_col[:N, :gq.shape[0] // 32],
                                            x8s, one), (N, K, M))


if __name__ == "__main__":
    main()
