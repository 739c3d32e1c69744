"""NV int8 linear: (a) planes two-pass (r2 path), (b) natural-order
two-pass, (c) fused kernel.  Decide _linear's NV routing."""
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
wN, wP, wTs = [], [], []
for i in range(nw):
    w = jax.random.normal(jax.random.PRNGKey(99 + i), (N, K), jnp.bfloat16) * 0.05
    gsw = jnp.float32(6.0) / jnp.max(jnp.abs(w.astype(jnp.float32)))
    wqt, wst = P.fused_quantize_nv(w, H32, gsw, rot_size=32, layout="kmajor")
    wN.append(I8.encode_nv_int8(wqt, wst))       # natural [K, N]
    wP.append(I8.encode_nv_int8_planes(wqt, wst))
    wTs.append(w.T)
params = {}

for M in (16, 256, 2048):
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
    gs = jnp.float32(6.0)

    def planes(d, j, p):
        x = chain_dep(a, d)
        xqt, xst = P.fused_quantize_nv(x, H32, gs, rot_size=32,
                                       layout="kmajor")
        xi, sx = I8.encode_nv_int8_planes(xqt, xst)
        wi, sw = wP[j % nw]
        return I8.matmul_mxf4_bf16_int8_kk(xi, wi, sx, sw, one)

    def natural(d, j, p):
        x = chain_dep(a, d)
        xqt, xst = P.fused_quantize_nv(x, H32, gs, rot_size=32,
                                       layout="kmajor")
        xi, sx = I8.encode_nv_int8(xqt, xst)
        wi, sw = wN[j % nw]
        return I8.matmul_mxf4_bf16_int8_kk(xi, wi, sx, sw, one)

    def fused(d, j, p):
        x = chain_dep(a, d)
        xi, sx, _ = KQ.fused_quantize_nv_int8(x, H32, gs, rot_size=32)
        wi, sw = wN[j % nw]
        return I8.matmul_mxf4_bf16_int8_kk(xi, wi, sx, sw, one)

    def bf16_linear(d, j, p):
        return chain_dep(a, d) @ wTs[j % nw]

    # planes activations cannot pair with the natural-order weights the
    # TP path requires; the decision is natural-XLA vs fused-kernel
    tn = benchmark(natural, repeats=3, params=params)
    tf = benchmark(fused, repeats=3, params=params)
    tb = benchmark(bf16_linear, repeats=3, params=params)
    print(f"M={M:5d}: natural {tn*1e6:7.1f}us ({tb/tn:4.2f}x) "
          f"fused {tf*1e6:7.1f}us ({tb/tf:4.2f}x) bf16 {tb*1e6:7.1f}us",
          flush=True)
