"""Decide per-M routing: fused quantize+encode kernel vs two-pass,
E2E linear, higher repeats."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import pallas_ops as P, int8path as I8
from qutlass_tpu.profiling import benchmark, chain_dep

def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray(hm * n ** -0.5, jnp.bfloat16)

H32 = hadamard(32)
one = jnp.ones((1,), jnp.float32)
K = N = 5120
nw = 8
wi8s, wsbs, wTs = [], [], []
for i in range(nw):
    w = jax.random.normal(jax.random.PRNGKey(99 + i), (N, K), jnp.bfloat16) * 0.05
    wqt, wst = P.fused_quantize_mx(w, H32, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    wi8s.append(wi8); wsbs.append(wsb); wTs.append(w.T)
params = {"wi8": wi8s, "wsb": wsbs, "wT": wTs}

for M in (1, 16, 64, 256, 1024, 2048):
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)

    def lin_two(d, j, p):
        x = chain_dep(a, d)
        cq, cs = P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def lin_fused(d, j, p):
        x = chain_dep(a, d)
        ai, sa, _ = KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                              method="quest")
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, p["wi8"][j % nw], sa,
                                               p["wsb"][j % nw], one)

    def bf16_linear(d, j, p):
        return chain_dep(a, d) @ p["wT"][j % nw]

    l2 = min(benchmark(lin_two, repeats=3, params=params) for _ in range(2))
    lf = min(benchmark(lin_fused, repeats=3, params=params) for _ in range(2))
    tb = min(benchmark(bf16_linear, repeats=3, params=params) for _ in range(2))
    print(f"M={M:5d}: two-pass {l2*1e6:7.1f}us ({tb/l2:4.2f}x) "
          f"fused {lf*1e6:7.1f}us ({tb/lf:4.2f}x) bf16 {tb*1e6:7.1f}us",
          flush=True)
