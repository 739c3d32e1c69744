"""Flax Linen integration tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

flax = pytest.importorskip("flax")
import flax.linen as nn

from qutlass_tpu.nn import QuartetDense
from qutlass_tpu.nn.flax_layers import swap_dense_kernels, _hadamard_cached
from helpers import randn_bf16


def test_quartet_dense_forward_and_grad():
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 32, 256, scale=1.0)
    layer = QuartetDense(features=128)
    params = layer.init(jax.random.PRNGKey(0), x)

    y = layer.apply(params, x)
    assert y.shape == (32, 128)

    def loss(p):
        return jnp.sum(layer.apply(p, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    gk = g["params"]["kernel"]
    assert gk.shape == (128, 256)
    assert np.isfinite(np.asarray(gk, np.float32)).all()


def test_quartet_dense_inference_mode():
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 16, 256, scale=1.0)
    layer = QuartetDense(features=128, train_quantized=False)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (16, 128)


def test_swap_dense_kernels():
    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(128, name="fc1")(x)
            return nn.Dense(64, name="fc2")(x)

    model = MLP()
    x = jnp.ones((4, 256), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x)
    h = _hadamard_cached(32)
    qp = swap_dense_kernels(params, h)
    fc1 = qp["params"]["fc1"]["kernel"]
    assert set(fc1) == {"wqt", "wst"}
    assert fc1["wqt"].shape == (128, 128)  # [K/2, N]
