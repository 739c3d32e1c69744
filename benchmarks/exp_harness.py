"""Diagnose the timing-harness zero-slope on plain XLA matmuls.

Hypothesis: XLA now rewrites reduce-add of a dot into a cheap
vector-dot (sum(A@B) == (1s@A)@B), so the chained-scan consumer
``c = sum(out)`` eliminates the matmul entirely.  Pallas calls are
opaque and survive.  Test consumers: sum, max, strided-slice.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from qutlass_tpu.profiling import chain_dep, enable_compile_cache

enable_compile_cache()

M, N, K = 2048, 5120, 5120
ITERS, CHAIN = 8, 8


def make_loop(n, consumer):
    @jax.jit
    def loop(dep, p):
        def body(c, _):
            for j in range(CHAIN):
                a = chain_dep(p["a"][j % 2], c)
                out = lax.dot_general(a, p["b"], (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
                c = consumer(out)
            return c, None
        c, _ = lax.scan(body, dep, None, length=n)
        return c
    return loop


def slope(consumer, params):
    l1, l5 = make_loop(ITERS, consumer), make_loop(5 * ITERS, consumer)
    d = jnp.zeros((1,), jnp.float32)
    l1(d, params).block_until_ready()
    l5(d, params).block_until_ready()
    t1 = t5 = np.inf
    for r in range(4):
        d = jnp.full((1,), 1.0 + r, jnp.float32)
        t0 = time.perf_counter()
        l1(d, params).block_until_ready()
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        l5(d, params).block_until_ready()
        t5 = min(t5, time.perf_counter() - t0)
    return max(t5 - t1, 1e-9) / (4 * ITERS * CHAIN)


def main():
    rng = np.random.default_rng(0)
    params = {"a": jnp.asarray(rng.standard_normal((2, M, K)), jnp.bfloat16),
              "b": jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)}
    consumers = {
        "sum": lambda o: jnp.sum(o, dtype=jnp.float32).reshape(1) * 1e-30,
        "max": lambda o: jnp.max(o).reshape(1).astype(jnp.float32) * 1e-30,
        "maxabs": lambda o: jnp.max(jnp.abs(o)).reshape(1).astype(
            jnp.float32) * 1e-30,
    }
    expect = 2 * M * N * K / 197e12  # ~545 us at v5e bf16 peak
    print(f"expected floor ~{expect*1e6:.0f} us (bf16 peak)")
    for name, c in consumers.items():
        s = slope(c, params)
        print(f"consumer={name:8s} {s*1e6:9.1f} us/op "
              f"{2*M*N*K/s/1e12:9.1f} TF/s")


if __name__ == "__main__":
    main()
