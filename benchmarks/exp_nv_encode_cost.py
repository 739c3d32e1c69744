"""Decompose the NV int8 linear at M=2048: quantize / encode / dot."""
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
M = 2048

w = jax.random.normal(jax.random.PRNGKey(9), (N, K), jnp.bfloat16) * 0.05
gsw = jnp.float32(6.0) / jnp.max(jnp.abs(w.astype(jnp.float32)))
wqt, wst = P.fused_quantize_nv(w, H32, gsw, rot_size=32, layout="kmajor")
ni, nsb = I8.encode_nv_int8_planes(wqt, wst)
a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
xqt, xst = P.fused_quantize_nv(a, H32, jnp.float32(6.0), rot_size=32,
                               layout="kmajor")
xi, sx = I8.encode_nv_int8_planes(xqt, xst)
params = {}

def quant_only(d, j, p):
    x = chain_dep(a, d)
    xq, xs = P.fused_quantize_nv(x, H32, jnp.float32(6.0), rot_size=32,
                                 layout="kmajor")
    return xq

def encode_only(d, j, p):
    xq = chain_dep(xqt, d)
    xi_, sx_ = I8.encode_nv_int8_planes(xq, xst)
    return xi_

def dot_only(d, j, p):
    x = chain_dep(xi, d)
    return I8.matmul_mxf4_bf16_int8_kk(x, ni, sx, nsb, one)

for name, f in [("quantize", quant_only), ("encode", encode_only),
                ("dot+fixup", dot_only)]:
    t = benchmark(f, repeats=3, params=params)
    print(f"{name:10s}: {t*1e6:8.1f} us", flush=True)
