"""Where do the int8-linear's non-dot microseconds live?

Components at M in {256, 2048}, K=5120 (and K=25600): quantize
(kmajor_codes), encode_int8, dot, full linear.  Run after bench.py
(shares the compile cache).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.ops import pallas_ops as P
from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

enable_compile_cache()
one = jnp.ones((1,), jnp.float32)


def run(M, K, N):
    rng = np.random.default_rng(0)
    h = jnp.asarray(np.linalg.qr(rng.standard_normal((32, 32)))[0],
                    jnp.bfloat16)
    import ml_dtypes
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    a = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray((rng.standard_normal((N, K)) * 0.05), jnp.bfloat16)
    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    cq0, cs0 = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                   layout="kmajor_codes")
    ai0, sa0, _ = I8.encode_int8(cq0, cs0, kmajor=True)
    params = {"wi8": wi8, "wsb": wsb, "cq": cq0, "cs": cs0,
              "ai": ai0, "sa": sa0}

    def quant_only(d, p):
        return P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                   method="quest", layout="kmajor_codes")[0]

    def encode_only(d, p):
        cq = jnp.maximum(p["cq"], (d.reshape(()) * 1e-30).astype(jnp.uint8))
        return I8.encode_int8(cq, p["cs"], kmajor=True)[0]

    def dot_only(d, p):
        dd = d.reshape(()).astype(jnp.float32)
        ai = jnp.maximum(p["ai"], (dd * 1e-30 - 127).astype(jnp.int8))
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"], p["sa"],
                                               p["wsb"], one)

    def full(d, p):
        cq, cs = P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                     method="quest", layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"], sa, p["wsb"],
                                               one)

    for name, op in (("quantize", quant_only), ("encode", encode_only),
                     ("dot", dot_only), ("full linear", full)):
        t = benchmark(op, params=params)
        print(f"M={M} K={K} N={N} {name:12s} {t*1e6:9.1f} us", flush=True)


if __name__ == "__main__":
    run(2048, 5120, 5120)
    run(256, 5120, 5120)
    run(2048, 25600, 5120)
