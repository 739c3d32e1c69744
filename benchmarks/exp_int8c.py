"""E2E quantized-linear timing: int8-MXU path vs Pallas decode path.

Per M: bf16 linear | composed Pallas (quantize kmajor + decode GEMM) |
int8 path (quantize kmajor_codes + encode_int8 + XLA int8 dot), weights
pre-prepared in both formats.  K=N=5120 (Qwen3-32B qkv geometry).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.ops import pallas_ops as P
from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache, tflops

enable_compile_cache()

K, N, NW = 5120, 5120, 4
one = jnp.ones((1,), jnp.float32)


def main():
    rng = np.random.default_rng(0)
    import ml_dtypes
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)

    wTs, wqts, wsts, wi8s, wsbs = [], [], [], [], []
    for i in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wi8, wsb, dmax = I8.prepare_weight_int8(wqt, wst)
        assert int(dmax) <= 3, int(dmax)
        wTs.append(w.T); wqts.append(wqt); wsts.append(wst)
        wi8s.append(wi8); wsbs.append(wsb)
    del w

    for M in (16, 64, 128, 256, 512, 1024, 2048):
        a = jnp.asarray((rng.standard_normal((M, K))
                         ).astype(ml_dtypes.bfloat16))
        bparams = {"wT": wTs}
        qparams = {"wqt": wqts, "wst": wsts}
        iparams = {"wi8": wi8s, "wsb": wsbs}

        def bf16_linear(d, j, p):
            return chain_dep(a, d) @ p["wT"][j % NW]

        def pallas_linear(d, j, p):
            x = chain_dep(a, d)
            xqt, xst = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                           layout="kmajor")
            return P.matmul_mxf4_bf16_kmajor(xqt, p["wqt"][j % NW], xst,
                                             p["wst"][j % NW], one)

        def int8_linear(d, j, p):
            x = chain_dep(a, d)
            cq, cs = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                         layout="kmajor_codes")
            ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
            return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % NW], sa,
                                                   p["wsb"][j % NW], one)

        tb = benchmark(bf16_linear, params=bparams)
        tp = benchmark(pallas_linear, params=qparams)
        ti = benchmark(int8_linear, params=iparams)
        print(f"M={M:5d}: bf16 {tb*1e6:7.1f}us  pallas {tp*1e6:7.1f}us "
              f"({tb/tp:4.2f}x)  int8 {ti*1e6:7.1f}us ({tb/ti:4.2f}x) "
              f"[{tflops(M, N, K, ti):6.1f} TF/s]", flush=True)


if __name__ == "__main__":
    main()
