"""Where does the NV oneshot quantize kernel spend its 2x-vs-MX time?

At M=2048 K=25600 (results_oneshot_largek_r5.log): MX oneshot 569 us,
NV oneshot 1201 us — same rotation, same int8 emit structure.  This
experiment measures local variants of the NV kernel (production copy +
diagnostics, some numerically WRONG on purpose) to localize the cost:

  V0 production     current kernel body (correct)
  V1 no-stash       derive mul/hs from byte in pass B instead of
                    stashing 2 extra f32 [gc,bm] arrays per chunk
                    (bitwise-equal by construction)
  V2 no-vm          pass A skips the m2max/vm chain (sigma wrong ->
                    diagnostic only: the exact-sigma cost)
  V3 passA-only     emits scale bytes + sigma but zero int8 body
                    (diagnostic: pass A cost incl. rotation)
  V4 e4m3-lite      pass A with pow2 scale bytes instead of e4m3
                    (numerically wrong for NV: the e4m3 encode cost)
  V5 magic-round    pass B rounds via the +1.5*2^23 magic add (2 f32
                    adds; bitwise == RTNE for |x| < 2^22 — |a| <= 127
                    here) instead of lax.round

Usage: python benchmarks/exp_nv_kernel_anatomy_r5.py [--m 2048 --k 25600]
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.formats import codecs as C
from qutlass_tpu.kernels.quantize import _h128, _rotate_chunk_t
from qutlass_tpu.kernels.tuning import oneshot_vmem_limit
from qutlass_tpu.profiling import benchmark, chain_dep
from qutlass_tpu.utils import ceil_div


def _nv_kernel(gs_ref, x_ref, h_ref, a_ref, s_ref, sg_ref, *, k, variant):
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 16
    byte_chunks, mul_chunks, hs_chunks = [], [], []
    vmax = None
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        g = xt.reshape(gc, 16, bm)
        amax = jnp.max(jnp.abs(g), axis=1)
        if variant == "e4m3lite":
            _, byte = C.pow2_floor_e8m0(amax * (1.0 / 6.0))
            mul = 6.0 * C.e8m0_recip_f32(byte)
            s = C.e8m0_decode_f32(byte)
        else:
            byte, mul = C.nv_absmax_scale_bytes(amax, gs_ref[0, 0])
            s = C.e4m3_decode_f32(byte.astype(jnp.int32))
            s = jnp.where(jnp.isnan(s), 0.0, s)
        hs = 0.5 * s
        if variant == "novm":
            vm = amax[:1] * 0.1     # WRONG on purpose — cost probe
        else:
            m2max = C.e2m1_codes_to_m2(
                C.e2m1_rtne_codes(amax * mul)).astype(jnp.float32)
            vm = jnp.max(hs * m2max, axis=0, keepdims=True)
        vmax = vm if vmax is None else jnp.maximum(vmax, vm)
        byte_chunks.append(byte)
        if variant not in ("nostash",):
            mul_chunks.append(mul)
            hs_chunks.append(hs)
    sigma = vmax / 127.0
    inv = jnp.where(sigma > 0, 1.0 / sigma, 0.0)
    s_ref[...] = (jnp.concatenate(byte_chunks, axis=0)
                  if len(byte_chunks) > 1 else byte_chunks[0]
                  ).astype(jnp.uint8)
    sg_ref[...] = sigma
    if variant == "passa":
        a_ref[...] = jnp.zeros(a_ref.shape, jnp.int8)
        return
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        byte = byte_chunks[c]
        if variant == "nostash":
            sfq = C.e4m3_decode_f32(byte.astype(jnp.int32))
            mul = jnp.where(sfq != 0.0, gs_ref[0, 0] / sfq, 0.0)
            mul = jnp.where(jnp.isnan(sfq), 0.0, mul)
            hs = 0.5 * jnp.where(jnp.isnan(sfq), 0.0, sfq)
        else:
            mul, hs = mul_chunks[c], hs_chunks[c]
        q = (xt.reshape(gc, 16, bm) * mul[:, None, :]).reshape(bkc, bm)
        m2 = C.e2m1_codes_to_m2(C.e2m1_rtne_codes(q)).astype(jnp.float32)
        v = (m2.reshape(gc, 16, bm) * hs[:, None, :]).reshape(bkc, bm)
        if variant == "magicround":
            a = (v * inv + 12582912.0) - 12582912.0   # RTNE, |x| <= 127
        else:
            a = jnp.round(v * inv)
        a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32).astype(jnp.int8)


def make_quant(k, rows, bm, variant):
    out_shapes = [jax.ShapeDtypeStruct((k, rows), jnp.int8),
                  jax.ShapeDtypeStruct((k // 16, rows), jnp.uint8),
                  jax.ShapeDtypeStruct((1, rows), jnp.float32)]
    out_specs = [
        pl.BlockSpec((k, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // 16, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i: (0, i), memory_space=pltpu.VMEM)]
    call = pl.pallas_call(
        functools.partial(_nv_kernel, k=k, variant=variant),
        grid=(ceil_div(rows, bm),),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=oneshot_vmem_limit(k, bm)),
    )
    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--k", type=int, default=25600)
    ap.add_argument("--bm", type=int, default=128)
    args = ap.parse_args()
    M, K, bm = args.m, args.k, args.bm

    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h128 = _h128(jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16), 32)
    gs = jnp.full((1, 1), 6.0, jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    p = {"a": a}

    ref = None
    for variant in ("prod", "nostash", "novm", "passa", "e4m3lite",
                    "magicround"):
        call = make_quant(K, M, bm, variant)
        try:
            ai, sb, sg = call(gs, a, h128)
            if variant == "prod":
                ref = (np.asarray(ai), np.asarray(sb), np.asarray(sg))
                ok = "ref"
            elif variant in ("nostash", "magicround"):
                got = (np.asarray(ai), np.asarray(sb), np.asarray(sg))
                ok = "BITWISE" if all(
                    np.array_equal(x, y) for x, y in zip(ref, got)) else "DIFF"
            else:
                ok = "diag"

            def f(d, j, pp, call=call):
                hc = chain_dep(h128, d)
                ai, _, sx = call(gs, pp["a"], hc)
                return ai + sx.astype(ai.dtype)[:1]
            t = min(benchmark(f, repeats=3, params=p) for _ in range(2))
            print(f"{variant:10s} {t*1e6:9.1f} us  "
                  f"{2*M*K/t/1e9:6.0f} GB/s in  [{ok}]", flush=True)
        except Exception as e:
            print(f"{variant:10s} FAIL {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
