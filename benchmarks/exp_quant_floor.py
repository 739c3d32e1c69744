"""Quantize-pass floor probe at M=2048 K=5120: fused MX/NV quantize vs
memory roofline (read 20MB bf16, write ~10-15MB)."""
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
M, K = 2048, 5120
a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)

def mx_kmajor(d, j, p):
    x = chain_dep(a, d)
    return P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                               layout="kmajor")[0]

def mx_codes(d, j, p):
    x = chain_dep(a, d)
    return P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                               layout="kmajor_codes")[0]

def mx_absmax(d, j, p):
    x = chain_dep(a, d)
    return P.fused_quantize_mx(x, H32, rot_size=32, method="abs_max",
                               layout="kmajor")[0]

def nv_q(d, j, p):
    x = chain_dep(a, d)
    return P.fused_quantize_nv(x, H32, jnp.float32(6.0), rot_size=32,
                               method="quest", layout="kmajor")[0]

def nv_am(d, j, p):
    x = chain_dep(a, d)
    return P.fused_quantize_nv(x, H32, jnp.float32(6.0), rot_size=32,
                               method="abs_max", layout="kmajor")[0]

def copy_roofline(d, j, p):   # read 20MB bf16 + write 20MB
    return chain_dep(a, d) * jnp.bfloat16(1.0001)

def rot_roofline(d, j, p):    # the rotation alone as an XLA matmul
    x = chain_dep(a, d).reshape(M, K // 32, 32)
    return jnp.einsum("mgj,ij->mgi", x, H32,
                      preferred_element_type=jnp.bfloat16)

for name, f in [("mx quest kmajor", mx_kmajor), ("mx quest codes", mx_codes),
                ("mx absmax", mx_absmax), ("nv quest", nv_q),
                ("nv absmax", nv_am), ("copy 20MB", copy_roofline),
                ("rotation einsum", rot_roofline)]:
    t = benchmark(f, repeats=3, params={})
    print(f"{name:16s}: {t*1e6:8.1f} us", flush=True)
