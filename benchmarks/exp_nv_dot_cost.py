"""Why is the NV kk int8 dot slow? Compare kk vs kmajor dots and raw
XLA int8 dots in both layouts at M=2048 K=N=5120."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.profiling import benchmark, chain_dep

one = jnp.ones((1,), jnp.float32)
K = N = 5120
M = 2048
kA = jax.random.randint(jax.random.PRNGKey(0), (K, M), -96, 96, jnp.int8)
kB = jax.random.randint(jax.random.PRNGKey(1), (K, N), -96, 96, jnp.int8)
mA = kA.T.copy()          # [M, K] row-major
nB = kB.T.copy()          # [N, K]
sa = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (M,), jnp.float32))
sb = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (N,), jnp.float32))

def kk(d, j, p):
    return I8.matmul_mxf4_bf16_int8_kk(chain_dep(kA, d), kB, sa, sb, one)

def kmaj(d, j, p):
    return I8.matmul_mxf4_bf16_int8_kmajor(chain_dep(kA, d), nB, sa, sb, one)

def raw_kk(d, j, p):
    y = jax.lax.dot_general(chain_dep(kA, d), kB, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sa[:, None] * sb[None, :]).astype(jnp.bfloat16)

def raw_mk_kn(d, j, p):
    y = jax.lax.dot_general(chain_dep(mA, d), kB, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sa[:, None] * sb[None, :]).astype(jnp.bfloat16)

def raw_mk_nk(d, j, p):
    y = jax.lax.dot_general(chain_dep(mA, d), nB, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * sa[:, None] * sb[None, :]).astype(jnp.bfloat16)

for name, f in [("lib kk", kk), ("lib kmajor", kmaj), ("raw kk (Kx M . K xN)", raw_kk),
                ("raw [M,K].[K,N]", raw_mk_kn), ("raw [M,K].[N,K]", raw_mk_nk)]:
    t = benchmark(f, repeats=3, params={})
    print(f"{name:22s}: {t*1e6:8.1f} us  ({2*M*N*K/t/1e12:6.1f} TF/s)", flush=True)
