"""Round-3 quantize-kernel anatomy: the kmajor_codes quantizer measures
104 us at M=2048 K=5120 vs a ~40 us HBM roofline (exp_mfu_breakdown_r3)
— find the expensive stage.

Variants (all [M, K] bf16 in, [K, M] u8-ish out, bk/bm from the tuned
table):
  full       production kernel (quest)          -- baseline
  absmax     production kernel (abs_max)        -- stats cost
  norot      transpose + cast only (no rotate, no quantize)
  rot        transpose + rotate + cast          -- rotate cost
  rot_dg     dot_general(h^T, x) rotate (no explicit x.T)
  enc        rotate + encode, scales fixed to 1 (no group stats)
"""
import os, sys, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.formats import codecs as C
from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.kernels.tuning import quantize_tiles
from qutlass_tpu.ops import pallas_ops as P
from qutlass_tpu.profiling import benchmark, chain_dep


def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray(hm * n ** -0.5, jnp.bfloat16)


H32 = hadamard(32)
M, K = 2048, 5120
bm, bk = quantize_tiles(M, K)
print(f"tiles bm={bm} bk={bk}", flush=True)


def _rotate_t_dg(x, h128):
    """(x @ H)^T via dot_general with x as rhs — no explicit x.T."""
    bm_, bk_ = x.shape
    blocks = [
        lax.dot_general(h128, x[:, g * 128:(g + 1) * 128],
                        (((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
        for g in range(bk_ // 128)
    ]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def k_norot(x_ref, h_ref, q_ref):
    xt = x_ref[...].T.astype(jnp.float32)
    q_ref[...] = xt.astype(jnp.int32).astype(jnp.uint8)


def k_rot(x_ref, h_ref, q_ref):
    xt = KQ._rotate_tile_t(x_ref[...], h_ref[...])
    q_ref[...] = xt.astype(jnp.int32).astype(jnp.uint8)


def k_rot_dg(x_ref, h_ref, q_ref):
    xt = _rotate_t_dg(x_ref[...], h_ref[...])
    q_ref[...] = xt.astype(jnp.int32).astype(jnp.uint8)


def k_enc(x_ref, h_ref, q_ref):
    xt = KQ._rotate_tile_t(x_ref[...], h_ref[...])
    codes = C.e2m1_rtne_codes(xt)
    q_ref[...] = codes.astype(jnp.uint8)


def mk(kernel):
    grid = (M // bm, K // bk)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bk, bm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, M), jnp.uint8),
    )


a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
h128 = jnp.kron(jnp.eye(4, dtype=jnp.bfloat16), H32)
params = {"a": a}


def run(name, fn):
    try:
        t = min(benchmark(fn, repeats=3, params=params) for _ in range(2))
        print(f"{name:8s} {t*1e6:7.1f} us", flush=True)
    except Exception as e:
        print(f"{name:8s} FAILED: {str(e)[:200]}", flush=True)


def full(d, j, p):
    cq, cs = P.fused_quantize_mx(chain_dep(p["a"], d), H32, rot_size=32,
                                 method="quest", layout="kmajor_codes")
    return cq.astype(jnp.float32).sum() + cs.astype(jnp.float32).sum()


def absmax(d, j, p):
    cq, cs = P.fused_quantize_mx(chain_dep(p["a"], d), H32, rot_size=32,
                                 method="abs_max", layout="kmajor_codes")
    return cq.astype(jnp.float32).sum() + cs.astype(jnp.float32).sum()


for name, kern in (("norot", k_norot), ("rot", k_rot),
                   ("rot_dg", k_rot_dg), ("enc", k_enc)):
    f = mk(kern)

    def var(d, j, p, f=f):
        return f(chain_dep(p["a"], d), h128).astype(jnp.float32).sum()
    run(name, var)

run("full", full)
run("absmax", absmax)
