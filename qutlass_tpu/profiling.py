"""Timing and profiling utilities.

The reference measures with triton's ``do_bench`` / CUDA graphs
(benchmarks/bench_mxfp4_sm120.py:109-125).  The TPU equivalent here is a
dependency-chained on-device ``lax.scan`` loop: per-op dispatch through
remote runtimes is not timeable, and each host-visible data dependency
stalls ~0.5 ms, so several op applications are chained per scan step and
the whole loop is one jitted dispatch.  TFLOP/s convention matches the
reference: 2*M*N*K / t.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


def benchmark(op, *, iters: int = 8, chain: int = 8, repeats: int = 3) -> float:
    """Median-free best-of-N seconds per op application.

    ``op(dep)`` must return an array and must consume the scalar-array
    ``dep`` so successive applications are data-dependent (defeats
    dispatch pipelining and caching).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def loop(dep):
        def body(c, _):
            for _ in range(chain):
                out = op(c)
                c = out.ravel()[:1].astype(jnp.float32) * 1e-30
            return c, None
        c, _ = lax.scan(body, dep, None, length=iters)
        return c

    d = jnp.zeros((1,), jnp.float32)
    loop(d).block_until_ready()
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        loop(d).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / (iters * chain))
    return best


def tflops(m: int, n: int, k: int, seconds: float) -> float:
    """Reference TFLOP/s convention (bench_mxfp4_sm120.py:127-128)."""
    return 2 * m * n * k / seconds / 1e12


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_compile_cache(path: str = "/root/repo/.jax_cache") -> None:
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
