"""On-device re-check of the session-4 changes (run when the TPU
tunnel recovers; CPU-emulation equivalents were green throughout).

1. fused quantize+int8 kernels at the NEW tile regime (K=25600:
   bm=128/bk=256 after the bk-first VMEM relief) — bitwise vs the XLA
   two-pass twins on the real device.
2. K=51200 (the genuine fallback regime) — wrappers compose the
   two-pass path; outputs bitwise equal to calling it directly.
3. A pre-quantized-interop roundtrip on-device.

    python benchmarks/tpu_recheck_r2s4.py
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import ml_dtypes

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import qutlass_tpu as q
from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import emulation as E, int8path as I8


def hadamard(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return jnp.asarray((h * n ** -0.5).astype(ml_dtypes.bfloat16))


print("devices:", jax.devices())
rng = np.random.default_rng(0)
h = hadamard(32)

for rows, k, label in ((256, 25600, "new bm=128/bk=256 regime"),
                       (128, 51200, "two-pass fallback regime"),
                       (256, 5120, "standard regime")):
    x = jnp.asarray((rng.standard_normal((rows, k)) * 2)
                    .astype(ml_dtypes.bfloat16))
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method="quest")
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method="quest")
    assert np.array_equal(np.asarray(pa), np.asarray(ea)), (rows, k)
    assert np.array_equal(np.asarray(psa), np.asarray(esa)), (rows, k)
    assert np.array_equal(np.asarray(psb), np.asarray(esb)), (rows, k)
    print(f"OK fused mx int8 [{rows}, {k}] ({label})")

# NV variant at the new regime
gs = jnp.asarray(1.7, jnp.float32)
h16 = hadamard(16)
x = jnp.asarray((rng.standard_normal((256, 25600)) * 2)
                .astype(ml_dtypes.bfloat16))
na, nsg, nsb = KQ.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                         method="abs_max")
ma, msg, msb = E.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                        method="abs_max")
# KNOWN (ROUND2_NOTES session 3): Pallas NV at rot_size=16 is not
# bitwise vs XLA emulation on-device — 1-ulp rotation-sum differences
# flip e4m3 scale bytes (MX's pow2 floor absorbs them; NV rot32 IS
# bitwise).  Gate on a tiny mismatch rate instead of exact equality.
mm = float(np.mean(np.asarray(na) != np.asarray(ma)))
mm_s = float(np.mean(np.asarray(nsg) != np.asarray(msg)))
mm_b = float(np.mean(np.asarray(nsb) != np.asarray(msb)))
assert mm < 1e-3 and mm_s < 1e-3 and mm_b < 1e-3, (mm, mm_s, mm_b)
print(f"OK fused nv int8 [256, 25600] rot16 (mismatch codes {mm:.2e} "
      f"scales {mm_s:.2e} fixup {mm_b:.2e} — known 1-ulp e4m3 flips)")
na32, nsg32, nsb32 = KQ.fused_quantize_nv_int8(x, hadamard(32), gs,
                                               rot_size=32,
                                               method="abs_max")
ma32, msg32, msb32 = E.fused_quantize_nv_int8(x, hadamard(32), gs,
                                              rot_size=32,
                                              method="abs_max")
# rot32 shows the same 1-ulp class at a lower rate (~3e-5 measured
# 2026-08-18; round-2's "rot32 bitwise" claim was a smaller probe).
mm32 = float(np.mean(np.asarray(na32) != np.asarray(ma32)))
mm32_b = float(np.mean(np.asarray(nsb32) != np.asarray(msb32)))
assert mm32 < 1e-3 and mm32_b < 1e-3, (mm32, mm32_b)
assert np.array_equal(np.asarray(nsg32), np.asarray(msg32))
print(f"OK fused nv int8 [256, 25600] rot32 (mismatch codes {mm32:.2e} "
      f"fixup {mm32_b:.2e})")

# interop roundtrip on-device
from qutlass_tpu import io as qio
from qutlass_tpu.models.transformer import quantize_weight

w = jnp.asarray((rng.standard_normal((256, 512)) * 0.05)
                .astype(ml_dtypes.bfloat16))
mx = quantize_weight(w, h=h, method="quest", fmt="mx", weight_format="both")
pk, sc = qio.export_quantized_weight(mx)
imp = qio.import_mxfp4_weight(pk, sc, weight_format="both")
for kk in ("wqt", "wst", "wi8", "wsb"):
    assert np.array_equal(np.asarray(imp[kk]), np.asarray(mx[kk])), kk
print("OK interop roundtrip on-device")
print("ALL OK")


# ---------------------------------------------------------------------------
# Session-5 additions: NV gsx L2-bound + abs_max marker path on-device
# ---------------------------------------------------------------------------

from qutlass_tpu.models.transformer import _linear, _rotate_rows, quantize_weight

x = jnp.asarray((rng.standard_normal((64, 512)) * 3).astype(ml_dtypes.bfloat16))
w = jnp.asarray((rng.standard_normal((256, 512)) * 0.05)
                .astype(ml_dtypes.bfloat16))
exact = np.asarray(x, np.float64) @ np.asarray(w, np.float64).T
refn = np.linalg.norm(exact)

# L2 bound dominates the rotated amax on-device (TPU f32 rounding
# differs from the CPU run that validated this)
for rot in (16, 32, 128):
    hh = hadamard(rot)
    xf = np.asarray(x, np.float32).reshape(-1, rot)
    bound = float(np.sqrt(np.max(np.sum(xf * xf, axis=-1))) * 1.004)
    amax = float(jnp.max(jnp.abs(_rotate_rows(x, hh))))
    assert amax <= bound, (rot, amax, bound)
print("OK gsx L2 bound dominates on-device")

# NV + abs_max-marker linears end-to-end on-device (norm-level)
for fmt, wf, method in (("nv", "int8", "abs_max"), ("nv", "fp4", "abs_max"),
                        ("mx", "int8", "abs_max"), ("mx", "fp4", "abs_max"),
                        ("mx", "int8", "quest")):
    wd = quantize_weight(w, h=h, method=method, fmt=fmt, weight_format=wf)
    y = np.asarray(_linear(x, wd, h, method, True), np.float32)
    ratio = float(np.linalg.norm(y) / refn)
    assert 0.8 < ratio < 1.25, (fmt, wf, method, ratio)
    print(f"OK _linear fmt={fmt} wf={wf} method={method} norm-ratio {ratio:.3f}")

# The scaled decoders gained variable-distance vector shifts (subnormal
# RTNE) this session; they trace inside the NVFP4 GEMM and QAT backward
# Pallas kernels — exercise those Mosaic lowerings explicitly.
xg = jnp.asarray((rng.standard_normal((128, 512)) * 2)
                 .astype(ml_dtypes.bfloat16))
wg = jnp.asarray((rng.standard_normal((128, 512)) * 0.05)
                 .astype(ml_dtypes.bfloat16))
gsd = jnp.asarray(3.0, jnp.float32)
aq, asf = q.fusedQuantizeNv(xg, h16, gsd, method="abs_max", layout="kmajor")
bq, bsf = q.fusedQuantizeNv(wg, h16, gsd, method="abs_max", layout="kmajor")
alpha = jnp.full((1,), 1.0 / (float(gsd) * float(gsd)), jnp.float32)
from qutlass_tpu.ops.dispatch import set_backend

y_p = q.matmul_nvf4_bf16_kmajor(aq, bq, asf, bsf, alpha)
set_backend("emulation")
y_e = q.matmul_nvf4_bf16_kmajor(aq, bq, asf, bsf, alpha)
set_backend("auto")
assert np.array_equal(np.asarray(y_p, np.float32),
                      np.asarray(y_e, np.float32))
print("OK nvf4 GEMM (e4m3 scaled decode) lowers + bitwise vs emulation")

mq, msf = q.fusedQuantizeMx(xg, h, method="quest")
tq, tsf = q.backward_qt_bf16(mq, msf, h, jnp.float32(1.0))
set_backend("emulation")
te, tse = q.backward_qt_bf16(mq, msf, h, jnp.float32(1.0))
set_backend("auto")
assert np.array_equal(np.asarray(tq), np.asarray(te))
assert np.array_equal(np.asarray(tsf), np.asarray(tse))
print("OK backward_qt (e2m1 scaled decode) lowers + bitwise vs emulation")

# gsx exact-vs-bound perf (the bound skips the second rotation; it is
# OPT-IN via QUTLASS_TPU_NV_GSX=bound pending this measurement — a
# clear win here justifies revisiting the default for throughput runs)
import os

from qutlass_tpu import profiling
from qutlass_tpu.models.transformer import quantize_weight as _qw

k_, n_ = 5120, 5120
wnv = _qw(jnp.asarray((rng.standard_normal((n_, k_)) * 0.02)
                      .astype(ml_dtypes.bfloat16)), h=h, method="quest",
          fmt="nv", weight_format="int8")
for m_ in (16, 256, 2048):
    xs = jnp.asarray((rng.standard_normal((m_, k_)) * 2)
                     .astype(ml_dtypes.bfloat16))
    times = {}
    for mode in ("exact", "bound"):
        os.environ["QUTLASS_TPU_NV_GSX"] = mode

        def op(dep, i, params, _m=mode):
            xx = profiling.chain_dep(params["x"], dep)
            return _linear(xx, params["w"], h, "abs_max", True)

        times[mode] = profiling.benchmark(op, params={"x": xs, "w": wnv})
    os.environ.pop("QUTLASS_TPU_NV_GSX", None)
    print(f"gsx M={m_:5d}: exact {times['exact']*1e6:8.1f}us  "
          f"bound {times['bound']*1e6:8.1f}us  "
          f"ratio {times['exact']/times['bound']:.3f}x")

# int8 KV cache decode-step timing (the motivating measurement: the
# decode attention is bandwidth-bound on the cache stream; int8 halves
# the bytes).  Qwen3-8B-ish geometry, long context.
from qutlass_tpu.models import (decode_step, init_params, prefill,
                                quantize_model_weights)
from qutlass_tpu.models.transformer import ModelConfig

cfg8 = ModelConfig(vocab_size=8192, hidden_size=4096,
                   intermediate_size=12288, num_layers=2, num_heads=32,
                   num_kv_heads=8, head_dim=128)
p8 = init_params(cfg8, jax.random.PRNGKey(0))
qp8 = quantize_model_weights(cfg8, p8, h)
ctx, b8 = 2048, 8
prompt = jnp.zeros((b8, ctx - 8), jnp.int32)
for fmtname in ("bf16", "int8"):
    _, cache8 = prefill(cfg8, qp8, prompt, h, max_len=ctx, quantized=True,
                        cache_format=fmtname)

    # qp8 must travel via ``params``: closure-captured weights embed as
    # constants in the remote compile request (HTTP 413 above ~100 MB)
    def op(dep, i, params, _f=fmtname):
        tok = (profiling.chain_dep(params["t"], dep)).astype(jnp.int32)
        lg, _ = decode_step(cfg8, params["p"], params["c"], tok,
                            jnp.int32(ctx - 8 + (i % 4)), h, quantized=True)
        return lg[..., :1]

    t = profiling.benchmark(op, params={"t": jnp.zeros((b8,), jnp.int32),
                                        "c": cache8, "p": qp8})
    print(f"decode step ctx={ctx} b={b8} cache={fmtname}: {t*1e6:9.1f} us")

print("ALL SESSION-5 CHECKS OK")
