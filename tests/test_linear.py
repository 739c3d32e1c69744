"""QuantizedLinear / quartet_linear QAT tests: jax.grad end-to-end."""
import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu.nn import QuantizedLinear, quartet_linear
from helpers import bf16_hadamard, randn_bf16


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)


def test_quantized_linear_forward():
    rng = np.random.default_rng(0)
    m, n, k = 64, 256, 512
    x = randn_bf16(rng, m, k, scale=1.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)

    lin = QuantizedLinear.create(w, h)
    y = lin(x)
    assert y.shape == (m, n) and y.dtype == jnp.bfloat16
    y_ref = x.astype(jnp.float32) @ w.astype(jnp.float32).T
    assert _cos(y, y_ref) > 0.97


def test_quantized_linear_batched_input():
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 2, 32, 512, scale=1.0)
    w = randn_bf16(rng, 256, 512, scale=0.05)
    lin = QuantizedLinear.create(w, bf16_hadamard(32))
    y = lin(x)
    assert y.shape == (2, 32, 256)


@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_quartet_linear_grad(method):
    """jax.grad through the quantized linear: gradients must align with
    the bf16 linear's gradients (quantization noise bounded)."""
    rng = np.random.default_rng(0)
    m, n, k = 128, 256, 512
    x = randn_bf16(rng, m, k, scale=1.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    t = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    h = bf16_hadamard(32)

    def loss_q(x, w):
        y = quartet_linear(x, w, h, method)
        return jnp.sum(y.astype(jnp.float32) * t)

    def loss_ref(x, w):
        y = x.astype(jnp.float32) @ w.astype(jnp.float32).T
        return jnp.sum(y * t)

    gx, gw = jax.grad(loss_q, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)

    assert gx.shape == x.shape and gw.shape == w.shape
    assert _cos(gx, rx) > 0.93, _cos(gx, rx)
    assert _cos(gw, rw) > 0.93, _cos(gw, rw)


def test_quartet_linear_value():
    rng = np.random.default_rng(0)
    m, n, k = 64, 128, 256
    x = randn_bf16(rng, m, k, scale=1.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)
    y = quartet_linear(x, w, h, "quest")
    y_ref = x.astype(jnp.float32) @ w.astype(jnp.float32).T
    assert _cos(y, y_ref) > 0.97


def test_quartet_linear_jit_grad():
    """The whole training step must be jittable."""
    rng = np.random.default_rng(0)
    m, n, k = 128, 128, 256
    x = randn_bf16(rng, m, k, scale=1.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)

    @jax.jit
    def step(x, w):
        return jax.grad(lambda w: jnp.sum(
            quartet_linear(x, w, h, "quest").astype(jnp.float32) ** 2))(w)

    g = step(x, w)
    assert g.shape == w.shape
    assert np.isfinite(np.asarray(g, np.float32)).all()
