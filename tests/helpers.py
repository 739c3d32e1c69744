"""Shared test utilities (mirrors reference test scaffolding)."""
import numpy as np
import ml_dtypes
import jax.numpy as jnp


def hadamard_matrix(n: int) -> np.ndarray:
    """Normalized Sylvester-Hadamard matrix H/sqrt(n) (n a power of two).

    Same as scipy.linalg.hadamard(n) * n**-0.5 used by the reference
    tests (mxfp4_test.py:39-42).
    """
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    assert h.shape[0] == n
    return h * n ** -0.5


def bf16_hadamard(n: int) -> jnp.ndarray:
    return jnp.asarray(hadamard_matrix(n), dtype=jnp.bfloat16)


def randn_bf16(rng: np.random.Generator, *shape, scale=25.0) -> jnp.ndarray:
    x = (rng.standard_normal(shape) * scale).astype(ml_dtypes.bfloat16)
    return jnp.asarray(x)


def rand_bf16(rng: np.random.Generator, *shape, scale=25.0) -> jnp.ndarray:
    x = (rng.random(shape) * scale).astype(ml_dtypes.bfloat16)
    return jnp.asarray(x)


def to_np64(x) -> np.ndarray:
    return np.asarray(x).astype(np.float64)


def bf16_np(x) -> np.ndarray:
    """Round a float64 numpy array to bfloat16 values (kept as f64)."""
    return np.asarray(x).astype(ml_dtypes.bfloat16).astype(np.float64)
