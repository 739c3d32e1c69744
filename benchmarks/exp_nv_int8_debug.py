"""Pinpoint the on-device NV fused-int8 quantize mismatch (recheck r2s4
failed at the [256, 25600] abs_max case; CPU is bitwise-equal).

    python benchmarks/exp_nv_int8_debug.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import ml_dtypes

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import emulation as E


def hadamard(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray((h * n ** -0.5).astype(ml_dtypes.bfloat16))


rng = np.random.default_rng(0)
h16 = hadamard(16)
gs = jnp.asarray(1.7, jnp.float32)

for rows, k in ((8, 256), (64, 2048), (256, 5120), (256, 25600)):
    x = jnp.asarray((rng.standard_normal((rows, k)) * 2)
                    .astype(ml_dtypes.bfloat16))
    na, nsg, nsb = KQ.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                             method="abs_max")
    ma, msg, msb = E.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                            method="abs_max")
    na_, ma_ = np.asarray(na), np.asarray(ma)
    nsg_, msg_ = np.asarray(nsg), np.asarray(msg)
    nsb_, msb_ = np.asarray(nsb), np.asarray(msb)
    da = int((na_ != ma_).sum())
    dg = int((nsg_ != msg_).sum()) if nsg_.shape == msg_.shape else -1
    db = int((nsb_ != msb_).sum()) if nsb_.shape == msb_.shape else -1
    print(f"[{rows},{k}] codes diff {da}/{na_.size}  "
          f"sg diff {dg}/{nsg_.size}  sb diff {db}/{nsb_.size}")
    if da and rows <= 64:
        idx = np.argwhere(na_ != ma_)[:8]
        for ij in idx:
            t = tuple(int(v) for v in ij)
            print("  codes", t, "pallas", na_[t], "emul", ma_[t])
    if dg and dg > 0:
        idx = np.argwhere(nsg_ != msg_)[:8]
        for ij in idx:
            t = tuple(int(v) for v in ij)
            print("  sg", t, "pallas", nsg_[t], "emul", msg_[t])
    if db and db > 0:
        idx = np.argwhere(nsb_ != msb_)[:8]
        for ij in idx:
            t = tuple(int(v) for v in ij)
            print("  sb", t, "pallas", nsb_[t], "emul", msb_[t])
