"""Probe: NVFP4 linear — int8-MXU evaluator vs fp4-decode GEMM vs bf16.

Decides the NV line in bench.py.  Full linear = fused NV quantize +
(encode_nv_int8_planes + int8 dot | decode GEMM)."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
nw = 4

wqts, wsts, nvi8s, nvsbs, wTs = [], [], [], [], []
for i in range(nw):
    w = jax.random.normal(jax.random.PRNGKey(99 + i), (N, K), jnp.bfloat16) * 0.05
    gsw = jnp.float32(6.0) / jnp.maximum(jnp.max(jnp.abs(w.astype(jnp.float32))), 1e-6)
    wqt, wst = P.fused_quantize_nv(w, H32, gsw, rot_size=32, layout="kmajor")
    ni, nsb = I8.encode_nv_int8_planes(wqt, wst)
    wqts.append(wqt); wsts.append(wst); nvi8s.append(ni); nvsbs.append(nsb)
    wTs.append(w.T)
params = {"wqt": wqts, "wst": wsts, "nvi8": nvi8s, "nvsb": nvsbs, "wT": wTs}

for M in (16, 256, 2048):
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)

    def nv_fp4(d, j, p):
        x = chain_dep(a, d)
        xqt, xst = P.fused_quantize_nv(x, H32, jnp.float32(6.0), rot_size=32,
                                       layout="kmajor")
        return P.matmul_nvf4_bf16_kmajor(xqt, p["wqt"][j % nw], xst,
                                         p["wst"][j % nw], one)

    def nv_int8(d, j, p):
        x = chain_dep(a, d)
        xqt, xst = P.fused_quantize_nv(x, H32, jnp.float32(6.0), rot_size=32,
                                       layout="kmajor")
        xi, sx = I8.encode_nv_int8_planes(xqt, xst)
        return I8.matmul_mxf4_bf16_int8_kk(xi, p["nvi8"][j % nw], sx,
                                           p["nvsb"][j % nw], one)

    def bf16_linear(d, j, p):
        return chain_dep(a, d) @ p["wT"][j % nw]

    t4 = benchmark(nv_fp4, repeats=3, params=params)
    t8 = benchmark(nv_int8, repeats=3, params=params)
    tb = benchmark(bf16_linear, repeats=3, params=params)
    tf = lambda t: 2 * M * N * K / t / 1e12
    print(f"M={M:5d}: fp4 {t4*1e6:8.1f}us ({tf(t4):6.2f} TF/s, {tb/t4:4.2f}x) "
          f"int8 {t8*1e6:8.1f}us ({tf(t8):6.2f} TF/s, {tb/t8:4.2f}x) "
          f"bf16 {tb*1e6:8.1f}us", flush=True)
