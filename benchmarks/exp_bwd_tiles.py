"""Tile sweep for the QAT backward Pallas kernels (the 0.86x residual).

square_double_scaled + transpose_scaled_kmajor at [4096, 4096]:
roofline ~80/51 us, measured 161/193 — try larger tiles.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qutlass_tpu.kernels import backward as KB
from qutlass_tpu.ops import pallas_ops as P
from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

enable_compile_cache()
M = N = K = 4096


def main():
    rng = np.random.default_rng(0)
    gy = jnp.asarray(rng.standard_normal((M, N)), jnp.bfloat16)
    qt = jnp.asarray(rng.integers(0, 255, (K // 2, M)), jnp.uint8)
    st = jnp.asarray(rng.integers(118, 130, (K // 32, M)), jnp.uint8)
    params = {"gy": gy, "qt": qt, "st": st}

    # --- transpose_scaled_kmajor tiles
    for bk, bn in [(512, 256), (256, 512), (512, 512), (512, 1024),
                   (1024, 512), (2048, 256), (256, 2048), (4096, 256)]:
        if K % bk or M % bn:
            continue

        @jax.jit
        def run(qt_, st_, bk=bk, bn=bn):
            return pl.pallas_call(
                KB._fp4t_scaled_kmajor_kernel,
                grid=(K // bk, M // bn),
                in_specs=[
                    pl.BlockSpec((bk // 2, bn), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk // 32, bn), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bk, bn), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((K, M), jnp.bfloat16),
            )(qt_, st_)

        def op(d, p):
            q_ = jnp.maximum(p["qt"], (d.reshape(()) * 1e-30).astype(jnp.uint8))
            return run(q_, p["st"])

        try:
            t = benchmark(op, params=params)
            print(f"transpose_scaled bk={bk:5d} bn={bn:5d}: {t*1e6:8.1f} us",
                  flush=True)
        except Exception as e:
            print(f"transpose_scaled bk={bk} bn={bn}: FAIL {repr(e)[:120]}",
                  flush=True)

    # --- square_double_scaled tiles (kernel takes full rows per block?)
    import inspect
    print(inspect.signature(KB.backward_square_double_scaled_2d), flush=True)

    def op2(d, p):
        return P.backward_square_double_scaled(chain_dep(p["gy"], d))
    t = benchmark(op2, params=params)
    print(f"square_double current: {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
