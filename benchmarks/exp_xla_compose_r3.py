"""Round-3: can XLA software-pipeline the activation quantize into the
int8 dot if the quantize is expressed in PURE XLA instead of Pallas?

Observation (exp_fused_int8_quant2.py, r2): the XLA-expressed
encode_int8 overlaps under the MXU-bound int8 dot (two-pass 436 <
sum-of-parts 499 at M=2048) — XLA fuses/pipelines the elementwise
producer into the dot's operand stream.  A Pallas quantize is an opaque
custom call and serializes.  If the WHOLE quantize (rotation + scales +
emit) runs as XLA ops, the serial region could shrink to the rotation
matmul only.

Variants at M in {512, 2048}, K=N=5120, rot 32, quest:
  dot      pure int8 dot + fixup (envelope)
  pallas2  Pallas quantize(kmajor_codes) -> XLA encode -> dot  [prod >10k]
  pallas1  Pallas oneshot int8 quantize -> dot                 [prod <=10k]
  xla3     emulation quantize(kmajor_codes) -> XLA encode -> dot
  bf16     baseline

Usage: python benchmarks/exp_xla_compose_r3.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import emulation as E
from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.ops import pallas_ops as P
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
    w = jax.random.normal(jax.random.PRNGKey(99 + i), (N, K),
                          jnp.bfloat16) * 0.05
    wqt, wst = P.fused_quantize_mx(w, H32, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    wi8s.append(wi8)
    wsbs.append(wsb)
    wTs.append(w.T)

for M in (512, 2048):
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
    cq0, cs0 = P.fused_quantize_mx(a, H32, rot_size=32, method="quest",
                                   layout="kmajor_codes")
    ai0, sa0, _ = I8.encode_int8(cq0, cs0, kmajor=True)
    params = {"wi8": wi8s, "wsb": wsbs, "wT": wTs, "a": a,
              "ai": ai0, "sa": sa0}

    def dot(d, j, p):
        ai = chain_dep(p["ai"], d)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw],
                                               p["sa"], p["wsb"][j % nw],
                                               one)

    def pallas2(d, j, p):
        x = chain_dep(p["a"], d)
        cq, cs = P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def pallas1(d, j, p):
        x = chain_dep(p["a"], d)
        ai, sa, _ = KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                              method="quest")
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def xla3(d, j, p):
        x = chain_dep(p["a"], d)
        cq, cs = E.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def bf16(d, j, p):
        return chain_dep(p["a"], d) @ p["wT"][j % nw]

    for name, fn in (("dot", dot), ("pallas2", pallas2),
                     ("pallas1", pallas1), ("xla3", xla3), ("bf16", bf16)):
        t = min(benchmark(fn, repeats=3, params=params) for _ in range(2))
        print(f"M={M:5d} {name:8s} {t*1e6:7.1f} us  "
              f"({tflops(M, N, K, t):6.1f} TF/s)", flush=True)
