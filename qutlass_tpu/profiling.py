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


def chain_dep(x, dep):
    """Inject the scalar chain dependency ``dep`` into operand ``x``.

    Numerically the identity, but opaque to XLA's simplifier.  A
    broadcast ``x + dep`` gets distributed through a following dot
    (hoisting the matmul out of the timing loop); a single-element
    dynamic-update still lets XLA recompute just the touched row.  An
    elementwise max against a huge negative traced value admits
    neither rewrite.
    """
    import jax.numpy as jnp
    d = dep.reshape(()).astype(jnp.float32)
    if x.dtype == jnp.uint8:
        return jnp.maximum(x, (d * 1e-30).astype(jnp.uint8))
    return jnp.maximum(x, (d * 1e-30 - 3e38).astype(x.dtype))


def benchmark(op, *, iters: int = 8, chain: int = 8, repeats: int = 3) -> float:
    """Seconds per op application, fixed dispatch cost removed.

    ``op(dep)`` must return an array and must consume the scalar-array
    ``dep`` so successive applications are data-dependent (defeats
    dispatch pipelining and caching); inject it with :func:`chain_dep`
    so XLA cannot hoist the work out of the loop.

    A single jitted dispatch through the remote-TPU tunnel costs a
    large constant (~30 ms measured on the axon tunnel) regardless of
    device work, so one absolute timing is meaningless.  This runs the
    chained scan at ``iters`` and ``3*iters`` iterations and returns
    the slope — per-iteration device time — dividing out the constant.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def make_loop(n):
        @jax.jit
        def loop(dep):
            def body(c, _):
                for _ in range(chain):
                    out = op(c)
                    # full reduction: consuming a slice instead lets XLA
                    # narrow the op to computing only that element (it
                    # rewrote the bf16 baseline matmul to a f32[1,1] dot)
                    c = jnp.sum(out, dtype=jnp.float32).reshape(1) * 1e-30
                return c, None
            c, _ = lax.scan(body, dep, None, length=n)
            return c
        return loop

    loop1, loop3 = make_loop(iters), make_loop(3 * iters)
    d = jnp.zeros((1,), jnp.float32)
    loop1(d).block_until_ready()
    loop3(d).block_until_ready()
    t1 = t3 = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        loop1(d).block_until_ready()
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        loop3(d).block_until_ready()
        t3 = min(t3, time.perf_counter() - t0)
    return max(t3 - t1, 1e-9) / (2 * iters * chain)


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
