"""Round-3 MFU breakdown: where do the non-dot microseconds go at
large M?  (VERDICT item 4: composed 238-270 TF/s vs 350 pure dot;
target >= 300 at M=2048.)

Pieces timed at M in {512, 2048}, K=N=5120, rot=32, method=quest:
  dot       pure int8 dot + rank-1 fixup (pre-encoded operands)
  quant     fused_quantize_mx(layout="kmajor_codes") alone
  encode    encode_int8(kmajor=True) alone
  fusedq    fused_quantize_mx_int8 alone (one kernel)
  two       composed quantize -> encode -> dot (production path)
  fused     composed fused-kernel -> dot
  bf16      baseline dot
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import pallas_ops as P, int8path as I8
from qutlass_tpu.profiling import benchmark, chain_dep, tflops


def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray(hm * n ** -0.5, jnp.bfloat16)


H32 = hadamard(32)
one = jnp.ones((1,), jnp.float32)
K = N = 5120
nw = 4
wi8s, wsbs, wTs = [], [], []
for i in range(nw):
    w = jax.random.normal(jax.random.PRNGKey(99 + i), (N, K), jnp.bfloat16) * 0.05
    wqt, wst = P.fused_quantize_mx(w, H32, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    wi8s.append(wi8); wsbs.append(wsb); wTs.append(w.T)

for M in (512, 2048):
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
    cq0, cs0 = P.fused_quantize_mx(a, H32, rot_size=32, method="quest",
                                   layout="kmajor_codes")
    ai0, sa0, _ = I8.encode_int8(cq0, cs0, kmajor=True)
    params = {"wi8": wi8s, "wsb": wsbs, "wT": wTs, "a": a,
              "cq": cq0, "cs": cs0, "ai": ai0, "sa": sa0}

    def dot(d, j, p):
        ai = chain_dep(p["ai"], d)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], p["sa"],
                                               p["wsb"][j % nw], one)

    def quant(d, j, p):
        x = chain_dep(p["a"], d)
        cq, cs = P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        return cq.astype(jnp.float32).sum() + cs.astype(jnp.float32).sum()

    def encode(d, j, p):
        cq = jnp.maximum(p["cq"], (d.reshape(()) * 1e-30).astype(p["cq"].dtype))
        ai, sa, _ = I8.encode_int8(cq, p["cs"], kmajor=True)
        return ai.astype(jnp.float32).sum() + sa.sum()

    def fusedq(d, j, p):
        x = chain_dep(p["a"], d)
        ai, sa, _ = KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                              method="quest")
        return ai.astype(jnp.float32).sum() + sa.sum()

    def two(d, j, p):
        x = chain_dep(p["a"], d)
        cq, cs = P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def fused(d, j, p):
        x = chain_dep(p["a"], d)
        ai, sa, _ = KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                              method="quest")
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def bf16(d, j, p):
        return chain_dep(p["a"], d) @ p["wT"][j % nw]

    for name, fn in (("dot", dot), ("quant", quant), ("encode", encode),
                     ("fusedq", fusedq), ("two", two), ("fused", fused),
                     ("bf16", bf16)):
        t = min(benchmark(fn, repeats=3, params=params) for _ in range(2))
        print(f"M={M:5d} {name:7s} {t*1e6:7.1f} us  "
              f"({tflops(M, N, K, t):6.1f} TF/s)", flush=True)
