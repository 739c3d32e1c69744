"""Benchmark-harness tests: chain_dep identity, slope timing sanity."""
import numpy as np
import jax
import jax.numpy as jnp

from qutlass_tpu.profiling import benchmark, chain_dep, tflops


def test_chain_dep_is_identity():
    d = jnp.zeros((1,), jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((16, 128)),
                    jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(chain_dep(x, d)), np.asarray(x))
    u = jnp.arange(256, dtype=jnp.uint8).reshape(2, 128)
    np.testing.assert_array_equal(np.asarray(chain_dep(u, d)), np.asarray(u))


def test_benchmark_slope_positive_and_params():
    x = jnp.ones((64, 128), jnp.float32)

    def op(d, j, p):
        return chain_dep(p["x"], d) * (j + 1)

    t = benchmark(op, iters=2, chain=2, repeats=1, params={"x": x})
    assert np.isfinite(t) and t > 0

    def op1(d):
        return chain_dep(x, d) + 1.0

    t1 = benchmark(op1, iters=2, chain=2, repeats=1)
    assert np.isfinite(t1) and t1 > 0


def test_tflops_convention():
    assert tflops(1024, 1024, 1024, 1e-3) == 2 * 1024 ** 3 / 1e-3 / 1e12
