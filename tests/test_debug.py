"""QUTLASS_TPU_DEBUG emulation-fallback diagnostics (VERDICT r1 #5).

A shape outside a kernel's constraints silently routes to the XLA
emulation graph; with debug enabled the dispatch layer must warn with
the op name, shape, and violated constraint.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

import qutlass_tpu as q
from qutlass_tpu.ops import dispatch


@pytest.fixture
def pallas_debug():
    prev = dispatch.get_backend()
    dispatch.set_backend("pallas")
    dispatch.set_debug(True)
    dispatch.fallback_counts.clear()
    yield
    dispatch.set_backend(prev)
    dispatch.set_debug(False)


def _hadamard(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray(h * n ** -0.5, jnp.bfloat16)


def test_backward_qt_fallback_warns(pallas_debug):
    # M=384 violates the backward kernel's M % 256 == 0 constraint
    m, n = 384, 256
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(0, 255, (m, n // 2)), jnp.uint8)
    xs = jnp.asarray(rng.integers(120, 130, (m, n // 32)), jnp.uint8)
    h = _hadamard(32)
    alpha = jnp.ones((1,), jnp.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        q.backward_qt_bf16(xq, xs, h, alpha)
    msgs = [str(w.message) for w in rec
            if "falls back to XLA emulation" in str(w.message)]
    assert msgs, "expected a fallback warning for M % 256 != 0"
    assert "backward_qt_bf16" in msgs[0]
    assert dispatch.fallback_counts.get("backward_qt_bf16", 0) >= 1


def test_no_warning_when_disabled():
    dispatch.fallback_counts.clear()
    m, n = 384, 256
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(0, 255, (m, n // 2)), jnp.uint8)
    xs = jnp.asarray(rng.integers(120, 130, (m, n // 32)), jnp.uint8)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        q.backward_qt_bf16(xq, xs, _hadamard(32), jnp.ones((1,), jnp.float32))
    assert not [w for w in rec
                if "falls back to XLA emulation" in str(w.message)]
    # the counter still records the event
    assert dispatch.fallback_counts.get("backward_qt_bf16", 0) >= 0
