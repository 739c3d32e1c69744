"""Which rotation forms agree BITWISE on the real TPU?

A: emulation _rotate (reshape [-1, 16] f32 @ f32 h16)
B: XLA 128-wide block-diagonal bf16 @ bf16 -> f32
C: XLA 128-wide block-diagonal f32 @ f32 -> f32
D: Pallas _rotate_tile (bf16 in, h128, MXU)
E: Pallas _rotate_tile_t (transposed orientation), transposed back

    python benchmarks/exp_rotate_bitwise.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import ml_dtypes
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import emulation as E


def hadamard(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray((h * n ** -0.5).astype(ml_dtypes.bfloat16))


rng = np.random.default_rng(0)
h16 = hadamard(16)
h128 = KQ._h128(h16, 16)
rows, k = 256, 2048
x = jnp.asarray((rng.standard_normal((rows, k)) * 2)
                .astype(ml_dtypes.bfloat16))

A = E._rotate(x, h16, 16)


@jax.jit
def rot_b(x):
    r = x.reshape(-1, 128)
    return jnp.dot(r, h128, preferred_element_type=jnp.float32
                   ).reshape(x.shape)


@jax.jit
def rot_c(x):
    r = x.reshape(-1, 128).astype(jnp.float32)
    return jnp.dot(r, h128.astype(jnp.float32),
                   preferred_element_type=jnp.float32).reshape(x.shape)


B = rot_b(x)
C = rot_c(x)


def tile_kernel(x_ref, h_ref, o_ref):
    o_ref[...] = KQ._rotate_tile(x_ref[...], h_ref[...])


def tile_t_kernel(x_ref, h_ref, o_ref):
    o_ref[...] = KQ._rotate_tile_t(x_ref[...], h_ref[...])


@jax.jit
def rot_d(x):
    return pl.pallas_call(
        tile_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x, h128)


@jax.jit
def rot_e(x):
    return pl.pallas_call(
        tile_t_kernel,
        out_shape=jax.ShapeDtypeStruct((x.shape[1], x.shape[0]),
                                       jnp.float32),
    )(x, h128).T


D = rot_d(x)
Ee = rot_e(x)

arrs = {"A(emul r16 f32)": A, "B(xla 128 bf16)": B, "C(xla 128 f32)": C,
        "D(pallas tile)": D, "E(pallas tile_t)": Ee}
names = list(arrs)
mats = {n: np.asarray(v) for n, v in arrs.items()}
for i in range(len(names)):
    for j in range(i + 1, len(names)):
        a, b = mats[names[i]], mats[names[j]]
        d = int((a != b).sum())
        print(f"{names[i]:18s} vs {names[j]:18s}: {d}/{a.size} diff")
