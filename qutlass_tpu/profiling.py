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


def benchmark(op, *, iters: int = 8, chain: int = 8, repeats: int = 5,
              params=None) -> float:
    """Seconds per op application, fixed dispatch cost removed.

    ``op(dep)`` must return an array and must consume the scalar-array
    ``dep`` so successive applications are data-dependent (defeats
    dispatch pipelining and caching); inject it with :func:`chain_dep`
    so XLA cannot hoist the work out of the loop.

    A single jitted dispatch through the remote-TPU tunnel costs a
    large constant (~30 ms measured on the axon tunnel) regardless of
    device work, so one absolute timing is meaningless.  This runs the
    chained scan at ``iters`` and ``5*iters`` iterations and returns
    the slope (t5 - t1) / (4*iters*chain) — per-iteration device time —
    dividing out the constant.
    """
    import inspect

    import jax
    import jax.numpy as jnp
    from jax import lax

    # ops may take (dep, chain_idx[, params]) to cycle through distinct
    # buffers — re-using one weight lets XLA keep it VMEM-resident
    # across the loop, which real multi-layer execution cannot.  Big
    # buffers must come through ``params`` (a pytree passed as a real
    # jit argument): closure-captured arrays are embedded as constants
    # in the compile request, which the remote-compile tunnel rejects
    # above ~100 MB (HTTP 413).
    nargs = sum(1 for p in inspect.signature(op).parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD))

    def call(c, j, p):
        if params is not None:
            return op(c, j, p) if nargs >= 3 else op(c, p)
        return op(c, j) if nargs >= 2 else op(c)

    def make_loop(n):
        @jax.jit
        def loop(dep, p):
            def body(c, _):
                for j in range(chain):
                    out = call(c, j, p)
                    # full reduction: consuming a slice instead lets XLA
                    # narrow the op to computing only that element (it
                    # rewrote the bf16 baseline matmul to a f32[1,1] dot)
                    c = jnp.sum(out, dtype=jnp.float32).reshape(1) * 1e-30
                return c, None
            c, _ = lax.scan(body, dep, None, length=n)
            return c
        return loop

    # 5x spread: the tunnel's dispatch constant jitters by ~10 ms, so
    # the iteration delta must put well more device work than that
    # between the two loop lengths
    # On the remote-TPU tunnel ``block_until_ready()`` does NOT block
    # (measured: a 174 ms loop "completes" in 0.1 ms; only a host fetch
    # of the value waits for execution).  Every timing below therefore
    # fetches the (1,)-f32 result to the host — the fetch roundtrip is
    # part of the constant the slope divides out.
    def run(loop, d):
        return float(np.asarray(loop(d, params))[0])

    loop1, loop5 = make_loop(iters), make_loop(5 * iters)
    d = jnp.zeros((1,), jnp.float32)
    run(loop1, d)
    run(loop5, d)
    t1 = t5 = np.inf
    for r in range(repeats):
        # the runtime also caches executions by input value — every
        # repetition must use a fresh dep value (the magnitude is
        # irrelevant: chain_dep folds it below the operand's least value)
        d = jnp.full((1,), 1.0 + r, jnp.float32)
        t0 = time.perf_counter()
        run(loop1, d)
        t1 = min(t1, time.perf_counter() - t0)
        d = jnp.full((1,), 101.0 + r, jnp.float32)
        t0 = time.perf_counter()
        run(loop5, d)
        t5 = min(t5, time.perf_counter() - t0)
    return max(t5 - t1, 1e-9) / (4 * iters * chain)


def benchmark_quantiles(op, *, iters: int = 8, chain: int = 8,
                        repeats: int = 7, quantiles=(0.2, 0.5, 0.8),
                        params=None):
    """Like :func:`benchmark` but returns per-op-time QUANTILES over
    paired repeats instead of the single min-slope point.

    The reference's measurement discipline reports 0.5/0.2/0.8 timing
    quantiles (reference benchmarks/bench_mxfp4_sm120.py:109-125); the
    slope harness here has a different noise source — the tunnel's
    ~10 ms dispatch jitter enters each (loop1, loop5) PAIR — so the
    quantiles are taken over per-repeat slope estimates, each repeat
    pairing one loop1 run with one adjacent loop5 run (fresh dep values
    per run to defeat the value-addressed execution cache).
    """
    import inspect

    import jax
    import jax.numpy as jnp
    from jax import lax

    slopes = []

    nargs = sum(1 for p in inspect.signature(op).parameters.values()
                if p.default is inspect.Parameter.empty
                and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD))

    def call(c, j, p):
        if params is not None:
            return op(c, j, p) if nargs >= 3 else op(c, p)
        return op(c, j) if nargs >= 2 else op(c)

    def make_loop(n):
        @jax.jit
        def loop(dep, p):
            def body(c, _):
                for j in range(chain):
                    out = call(c, j, p)
                    c = jnp.sum(out, dtype=jnp.float32).reshape(1) * 1e-30
                return c, None
            c, _ = lax.scan(body, dep, None, length=n)
            return c
        return loop

    def run(loop, d):
        return float(np.asarray(loop(d, params))[0])

    loop1, loop5 = make_loop(iters), make_loop(5 * iters)
    run(loop1, jnp.zeros((1,), jnp.float32))
    run(loop5, jnp.zeros((1,), jnp.float32))
    for r in range(repeats):
        d = jnp.full((1,), 1000.0 + r, jnp.float32)
        t0 = time.perf_counter()
        run(loop1, d)
        t1 = time.perf_counter() - t0
        d = jnp.full((1,), 2000.0 + r, jnp.float32)
        t0 = time.perf_counter()
        run(loop5, d)
        t5 = time.perf_counter() - t0
        slopes.append(max(t5 - t1, 1e-9) / (4 * iters * chain))
    return tuple(float(np.quantile(slopes, q)) for q in quantiles)


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
        if jax.default_backend() != "tpu":
            return   # CPU AOT cache entries are host-CPU-specific
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
