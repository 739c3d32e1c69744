"""Round-4 oneshot quantize+int8 kernel variants (VERDICT r3 item 2).

The composed large-M linear is quantize + dot run back-to-back (Mosaic
kernel and XLA dot cannot overlap on one core), so the path to >=85% of
the int8-dot envelope is a faster quantize.  Anatomy at M=2048 K=5120:
oneshot ~114 us vs ~38 us HBM roofline — VPU-bound on the quantize
math.  Variants:

  V0  production oneshot (pass A stats, pass B re-rotate + codes
      round-trip: e2m1_rtne_codes -> codes_to_m2 -> *f -> round)
  V1  pass B uses the direct grid rounding e2m1_rtne_m2_f32 (no code
      representation; saves ~10 int ops/element), still re-rotates
  V2  pass A computes m2 directly and stashes it INTO a_ref (int8, no
      extra scratch); pass B reads it back and rescales — single
      rotation, no re-quantize
  V2w rolled-loop variant of V2 (fori_loop over chunks, smaller code)

All variants are checked bitwise against V0 on-device before timing.

Usage: python benchmarks/exp_oneshot_v2_r4.py [--M 2048] [--K 5120]
"""
import argparse
import functools
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.formats import codecs as C  # noqa: E402
from qutlass_tpu.kernels.quantize import (_h128,  # noqa: E402
                                          _rotate_chunk_t)
from qutlass_tpu.utils import ceil_div  # noqa: E402


def _kernel_v1(x_ref, h_ref, a_ref, s_ref, sa_ref, *, method, k):
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 32
    byte_chunks = []
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        g = xt.reshape(gc, 32, bm)
        if method == "quest":
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
        else:
            scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))
        _, byte = C.pow2_floor_e8m0(scale)
        byte_chunks.append(byte)
    byte = (jnp.concatenate(byte_chunks, axis=0) if len(byte_chunks) > 1
            else byte_chunks[0])
    e = jnp.max(byte, axis=0, keepdims=True)
    inv = C.e8m0_recip_f32(byte)
    f = C.pow2_f32(3 - (e - byte))
    s_ref[...] = byte.astype(jnp.uint8)
    sa_ref[...] = C.pow2_f32(e - 131)
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        q = (xt.reshape(gc, 32, bm) * inv[c * gc:(c + 1) * gc][:, None, :]
             ).reshape(bkc, bm)
        if method != "quest":
            q = q * 3.0
        m2 = C.e2m1_rtne_m2_f32(q)
        a = jnp.round((m2.reshape(gc, 32, bm)
                       * f[c * gc:(c + 1) * gc][:, None, :]).reshape(bkc, bm))
        a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32).astype(jnp.int8)


def _kernel_v2(x_ref, h_ref, a_ref, s_ref, sa_ref, *, method, k):
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 32
    byte_chunks = []
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        g = xt.reshape(gc, 32, bm)
        if method == "quest":
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
        else:
            scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))
        _, byte = C.pow2_floor_e8m0(scale)
        inv = C.e8m0_recip_f32(byte)
        q = (g * inv[:, None, :]).reshape(bkc, bm)
        if method != "quest":
            q = q * 3.0
        m2 = C.e2m1_rtne_m2_f32(q)
        a_ref[c * bkc:(c + 1) * bkc, :] = m2.astype(jnp.int32
                                                    ).astype(jnp.int8)
        byte_chunks.append(byte)
    byte = (jnp.concatenate(byte_chunks, axis=0) if len(byte_chunks) > 1
            else byte_chunks[0])
    e = jnp.max(byte, axis=0, keepdims=True)
    f = C.pow2_f32(3 - (e - byte))
    s_ref[...] = byte.astype(jnp.uint8)
    sa_ref[...] = C.pow2_f32(e - 131)
    for c in range(k // bkc):
        m2 = a_ref[c * bkc:(c + 1) * bkc, :].astype(jnp.int32
                                                    ).astype(jnp.float32)
        a = jnp.round((m2.reshape(gc, 32, bm)
                       * f[c * gc:(c + 1) * gc][:, None, :]).reshape(bkc, bm))
        a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32).astype(jnp.int8)


def _kernel_v2w(x_ref, h_ref, a_ref, s_ref, sa_ref, *, method, k):
    # like V2 but the rescale loop is a rolled fori_loop
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 32
    byte_chunks = []
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        g = xt.reshape(gc, 32, bm)
        if method == "quest":
            scale = C.mx_scale_quest(jnp.sum(g, axis=1),
                                     jnp.sum(g * g, axis=1), 32.0)
        else:
            scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))
        _, byte = C.pow2_floor_e8m0(scale)
        inv = C.e8m0_recip_f32(byte)
        q = (g * inv[:, None, :]).reshape(bkc, bm)
        if method != "quest":
            q = q * 3.0
        m2 = C.e2m1_rtne_m2_f32(q)
        a_ref[c * bkc:(c + 1) * bkc, :] = m2.astype(jnp.int32
                                                    ).astype(jnp.int8)
        byte_chunks.append(byte)
    byte = (jnp.concatenate(byte_chunks, axis=0) if len(byte_chunks) > 1
            else byte_chunks[0])
    e = jnp.max(byte, axis=0, keepdims=True)
    s_ref[...] = byte.astype(jnp.uint8)
    sa_ref[...] = C.pow2_f32(e - 131)

    def body(c, _):
        seb = s_ref[pl.ds(c * gc, gc), :].astype(jnp.int32)
        f = C.pow2_f32(3 - (e - seb))
        m2 = a_ref[pl.ds(c * bkc, bkc), :].astype(jnp.int32
                                                  ).astype(jnp.float32)
        a = jnp.round((m2.reshape(gc, 32, bm) * f[:, None, :]
                       ).reshape(bkc, bm))
        a_ref[pl.ds(c * bkc, bkc), :] = a.astype(jnp.int32).astype(jnp.int8)
        return 0

    lax.fori_loop(0, k // bkc, body, 0)


def make_call(kernel, rows, k, bm, method="quest"):
    out_shapes = [jax.ShapeDtypeStruct((k, rows), jnp.int8),
                  jax.ShapeDtypeStruct((k // 32, rows), jnp.uint8),
                  jax.ShapeDtypeStruct((1, rows), jnp.float32)]
    out_specs = [
        pl.BlockSpec((k, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((k // 32, bm), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bm), lambda i: (0, i), memory_space=pltpu.VMEM)]

    @jax.jit
    def call(x2, h128):
        return pl.pallas_call(
            functools.partial(kernel, method=method, k=k),
            grid=(ceil_div(rows, bm),),
            in_specs=[
                pl.BlockSpec((bm, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
        )(x2, h128)

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--K", type=int, default=5120)
    ap.add_argument("--N", type=int, default=5120)
    ap.add_argument("--bms", default="256")
    args = ap.parse_args()
    M, K, N = args.M, args.K, args.N

    from qutlass_tpu.ops import dispatch, int8path as I8
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep

    assert dispatch.on_tpu()
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    h128 = _h128(h, 32)
    one = jnp.ones((1,), jnp.float32)

    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    ref = P.fused_quantize_mx_int8(a, h, rot_size=32, method="quest")
    ref = [np.asarray(r) for r in ref]

    wi8s, wsbs = [], []
    for i in range(4):
        w = (jax.random.normal(jax.random.PRNGKey(i), (N, K),
                               jnp.bfloat16) * 0.05)
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
        wi8s.append(wi8)
        wsbs.append(wsb)

    def bench_standalone(name, fn):
        def op(d, j, p):
            x = chain_dep(p["a"], d)
            ai, sb, sa = fn(x, h128)
            return ai
        t = benchmark(op, repeats=3, params={"a": a})
        print(f"{name} standalone: {t*1e6:8.1f} us", flush=True)
        return t

    def bench_composed(name, fn):
        def op(d, j, p):
            x = chain_dep(p["a"], d)
            ai, sb, sa = fn(x, h128)
            return I8.matmul_mxf4_bf16_int8_kmajor(
                ai, p["wi8"][j % 4], sa.reshape(M), p["wsb"][j % 4], one)
        t = benchmark(op, repeats=3,
                      params={"a": a, "wi8": wi8s, "wsb": wsbs})
        tf = 2 * M * N * K / t / 1e12
        print(f"{name} composed:   {t*1e6:8.1f} us ({tf:6.1f} TF/s, "
              f"{tf/354*100:4.1f}% of envelope)", flush=True)
        return t

    # V0 production baseline
    def v0(x, _h):
        ai, sa, sb = P.fused_quantize_mx_int8(x, h, rot_size=32,
                                              method="quest")
        return ai, sb, sa.reshape(1, -1)

    bench_standalone("V0(prod)  ", v0)
    bench_composed("V0(prod)  ", v0)

    for bm in [int(b) for b in args.bms.split(",")]:
        if M % bm:
            continue
        for name, kern in (("V1-direct", _kernel_v1),
                           ("V2-stash ", _kernel_v2),
                           ("V2w-roll ", _kernel_v2w)):
            call = make_call(kern, M, K, bm)
            got = [np.asarray(r) for r in call(a, h128)]
            ok = (np.array_equal(got[0], ref[0])
                  and np.array_equal(got[1], ref[2])
                  and np.array_equal(got[2].ravel(), ref[1]))
            tag = f"{name} bm={bm}"
            if not ok:
                da = int((got[0] != ref[0]).sum())
                print(f"{tag}: BITWISE MISMATCH ({da} int8 elts)",
                      flush=True)
                continue
            fn = lambda x, hh, c=call: c(x, hh)
            bench_standalone(tag, fn)
            bench_composed(tag, fn)


if __name__ == "__main__":
    main()
