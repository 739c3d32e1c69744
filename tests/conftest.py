"""Test configuration.

Tests default to the CPU backend with an 8-device virtual mesh so the
suite is hermetic (the driver validates multi-chip sharding this way).
Set QUTLASS_TPU_TEST_PLATFORM=tpu to run the same suite on real TPU
hardware (kernel-vs-golden checks then exercise the compiled Pallas
path).
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      os.environ.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=8")

_PLATFORM = os.environ.get("QUTLASS_TPU_TEST_PLATFORM", "cpu")

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed_each_test():
    np.random.seed(0)


@pytest.fixture
def on_tpu():
    return jax.default_backend() not in ("cpu", "gpu")
