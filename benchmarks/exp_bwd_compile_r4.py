"""Round-4 backward_t compile-pathology bisect (VERDICT r3 item 7).

backward_t_bf16 at (N=512, K=768) hits a >10-min Mosaic compile while
(512, 256) compiles in seconds.  The only shape-derived difference is
the K tile: _pick_bk(768) = 768 (a non-power-of-2 multiple of 128, so
the kernel's uint8 transpose and [bk, 128] output block get awkward
tilings), vs bk = 256.  This script compiles the kernel at a grid of
(N, K, forced bk) with a per-shape timeout IN A SUBPROCESS (a hung
Mosaic compile cannot be interrupted in-process) and reports compile
wall time.

Usage: python benchmarks/exp_bwd_compile_r4.py
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import functools
# COLD compiles only: the persistent cache would serve a previously
# compiled binary in ~1.2 s and mask the compile-time pathology this
# script exists to measure (r5 rerun hit exactly that)
jax.config.update("jax_enable_compilation_cache", False)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, %(repo)r)
from qutlass_tpu.kernels.backward import _backward_t_kernel
from qutlass_tpu.kernels.quantize import _h128

n, k, bk = %(n)d, %(k)d, %(bk)d
bn = 256
hm = np.array([[1.0]])
while hm.shape[0] < 32:
    hm = np.block([[hm, hm], [hm, -hm]])
h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(0), (n, k), jnp.bfloat16)

@jax.jit
def call(x, h128):
    return pl.pallas_call(
        _backward_t_kernel,
        grid=(k // bk, n // bn),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bk, bn // 2), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn // 32, bk), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n // 2), jnp.uint8),
            jax.ShapeDtypeStruct((n // 32, k), jnp.uint8),
        ],
    )(x, _h128(h, 32))

t0 = time.time()
out = call(x, h)
np.asarray(out[0])
print(f"COMPILED in {time.time()-t0:.1f}s", flush=True)
"""


def main():
    # pathological candidates LAST: a timed-out child leaves its remote
    # compile grinding server-side, which would serialize (and falsely
    # time out) every case queued behind it
    # r5 NOTE: the remote compile helper ALSO caches by program, so a
    # case ever compiled before returns in ~1.5 s regardless of the
    # local-cache setting — every rerun of this bisect must use a
    # FRESH shape row (results_bwd_compile_r5_cachehit.log shows the
    # masked rerun).  The N=1024 row below was never compiled before
    # the r5 run.
    cases = [
        (1024, 256, 256),    # known-good baseline
        (1024, 768, 256),    # pow2 tile on the pathological K
        (1024, 1536, 512),   # pow2 tile, bigger K
        (1024, 768, 384),    # non-pow2 tile, half size
        (1024, 768, 768),    # the pathological production pick
    ]
    for n, k, bk in cases:
        child = CHILD % {"repo": REPO, "n": n, "k": k, "bk": bk}
        t0 = time.time()
        try:
            # cold remote compiles through the tunnel run ~160 s even
            # for known-good shapes (measured here); 420 s separates
            # slow-normal from the >10-min pathology
            p = subprocess.run([sys.executable, "-c", child],
                               capture_output=True, timeout=420, text=True)
            tail = (p.stdout.strip().splitlines() or ["?"])[-1]
            print(f"N={n} K={k} bk={bk}: {tail} "
                  f"(wall {time.time()-t0:.0f}s rc={p.returncode})",
                  flush=True)
            if p.returncode:
                print(p.stderr[-500:], flush=True)
        except subprocess.TimeoutExpired:
            print(f"N={n} K={k} bk={bk}: TIMEOUT >420s (pathological)",
                  flush=True)


if __name__ == "__main__":
    main()
