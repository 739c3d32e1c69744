"""Pallas TPU kernels: fused rotation + block quantization.

One kernel family replaces the reference's per-rotation-size CUTLASS
template zoo (fused_quantize_{mx,nv}.cu + epilogue_quant.h, ~3k LoC):
the rotation is lifted to a single 128x128 block-diagonal matrix
``H128 = kron(I_{128/gs}, H)`` so every rotation size in {16,32,64,128}
runs the same MXU matmul at full systolic-array width.

In-kernel data layout: after the rotation matmul the tile is transposed
to K-major ([K, rows]) so that
  * quantization groups (32/16 along K) are *sublane* groups — cheap
    VPU reductions and broadcasts,
  * nibble packing is a sublane-pair ``pltpu.bitcast`` (u8 -> u16),
  * mask-bit packing is a weighted sublane-group sum.
This replaces the Blackwell scale-swizzle machinery entirely: scales are
emitted row-major [rows, K/gs] (SURVEY.md §2.4 "TPU equivalent").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import codecs as C
from ..utils import ceil_div, round_up
from .tuning import (oneshot_vmem_limit, quantize_int8_oneshot_bm,
                     quantize_int8_tiles, quantize_tiles)


def _rotate_tile(x, h128):
    """[bm, bk] bf16 -> rotated f32 via one MXU matmul on 128-wide rows."""
    bm, bk = x.shape
    r = x.reshape(bm * bk // 128, 128)
    xh = jnp.dot(r, h128, preferred_element_type=jnp.float32)
    return xh.reshape(bm, bk)


def _rotate_tile_t(x, h128):
    """[bm, bk] bf16 -> rotated K-major f32 [bk, bm].

    Bitwise equal to ``_rotate_tile(x, h128).T`` (verified on the MXU:
    both orientations accumulate the same 128 products identically) but
    transposes the bf16 *input* instead of the f32 output — half the
    relayout traffic — and feeds the MXU per 128-block with H^T on the
    left.
    """
    bm, bk = x.shape
    xt = x.T                                    # bf16 relayout
    ht = h128.T
    blocks = [
        jnp.dot(ht, xt[g * 128:(g + 1) * 128],
                preferred_element_type=jnp.float32)
        for g in range(bk // 128)
    ]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _pack_sublane_pairs(codes_i32):
    """e2m1 codes i32 [bk, bm] -> packed u8 [bk/2, bm] (row 2k low nibble).

    Sublane-pair merge via one 16->32 bitcast (little-endian: row 2k
    lands in the low half) — two dtype-conversion relayouts total
    instead of three.
    """
    u16 = codes_i32.astype(jnp.uint16)
    u32 = pltpu.bitcast(u16, jnp.uint32).astype(jnp.int32)
    return ((u32 & 0xF) | ((u32 >> 12) & 0xF0)).astype(jnp.uint8)


def _mask_bytes(q_abs_lt6, bk, bm):
    """bool [bk, bm] -> packed mask u8 [bk/8, bm] (bit i = element 8j+i)."""
    row = lax.broadcasted_iota(jnp.int32, (bk, bm), 0)
    w = q_abs_lt6.astype(jnp.int32) << (row & 7)
    return w.reshape(bk // 8, 8, bm).sum(axis=1).astype(jnp.uint8)


def _quantize_mx_kernel(x_ref, h_ref, q_ref, s_ref, *rest,
                        method, emit_mask, kmajor):
    mask_ref = rest[0] if emit_mask else None
    bm, bk = x_ref.shape
    xt = _rotate_tile_t(x_ref[...], h_ref[...])  # [bk, bm] f32, K on sublanes
    g = xt.reshape(bk // 32, 32, bm)

    if method == "quest":
        s1 = jnp.sum(g, axis=1)
        s2 = jnp.sum(g * g, axis=1)
        scale = C.mx_scale_quest(s1, s2, 32.0)
    else:
        scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))

    _, byte = C.pow2_floor_e8m0(scale)          # [bk/32, bm]
    inv = C.e8m0_recip_f32(byte)                # exact pow2 reciprocal
    q = (g * inv[:, None, :]).reshape(bk, bm)
    if method != "quest":
        q = q * 3.0

    codes = C.e2m1_rtne_codes(q)
    if kmajor == "codes":
        # activation fast layout: skip nibble packing entirely — the
        # GEMM's SWAR decode pairs rows with one sublane bitcast
        q_ref[...] = codes.astype(jnp.uint8)    # [bk, bm] K-major
    else:
        packed = _pack_sublane_pairs(codes)     # [bk/2, bm] K-major
        q_ref[...] = packed if kmajor else packed.T
    # scales/mask are always emitted K-major ([K/32, rows]): their lane
    # dims in row-major blocks (bk/32, bk/8) would violate Mosaic's
    # 128-lane divisibility; K-major is also the GEMM-native layout.
    s_ref[...] = byte.astype(jnp.uint8)         # [bk/32, bm]
    if emit_mask:
        mask_ref[...] = _mask_bytes(jnp.abs(q) < 6.0, bk, bm)  # [bk/8, bm]


def _quantize_nv_kernel(gs_ref, x_ref, h_ref, q_ref, s_ref, *, method,
                        kmajor):
    bm, bk = x_ref.shape
    xt = _rotate_tile_t(x_ref[...], h_ref[...])
    g = xt.reshape(bk // 16, 16, bm)

    if method == "quest":
        s1 = jnp.sum(g, axis=1)
        s2 = jnp.sum(g * g, axis=1)
        byte, mul = C.nv_quest_scale_bytes(s1, s2)
    else:
        amax = jnp.max(jnp.abs(g), axis=1)
        byte, mul = C.nv_absmax_scale_bytes(amax, gs_ref[0, 0])

    q = (g * mul[:, None, :]).reshape(bk, bm)
    codes = C.e2m1_rtne_codes(q)
    packed = _pack_sublane_pairs(codes)
    q_ref[...] = packed if kmajor else packed.T
    s_ref[...] = byte.astype(jnp.uint8)         # K-major [bk/16, bm]


def _pad_scales(sc: jax.Array, pr: int, pc: int) -> jax.Array:
    """Place [rows, cols] scale bytes into the x128/x4 padded buffer."""
    rows, cols = sc.shape
    if (rows, cols) == (pr, pc):
        return sc
    out = jnp.zeros((pr, pc), jnp.uint8)
    return lax.dynamic_update_slice(out, sc, (0, 0))


def _h128(h: jax.Array, rot_size: int) -> jax.Array:
    """Lift [gs, gs] rotation to the 128x128 block-diagonal operand."""
    reps = 128 // rot_size
    if reps == 1:
        return h.astype(jnp.bfloat16)
    return jnp.kron(jnp.eye(reps, dtype=jnp.bfloat16), h.astype(jnp.bfloat16))


@functools.partial(jax.jit,
                   static_argnames=("rot_size", "method", "return_mask",
                                    "layout"))
def fused_quantize_mx(a: jax.Array, h: jax.Array, *, rot_size: int,
                      method: str = "quest", return_mask: bool = False,
                      layout: str = "rowmajor"):
    """Pallas fused MXFP4 quantize.  Same contract as the emulation op.

    ``layout="kmajor"`` emits the GEMM-native layout directly —
    packed [K/2, rows] and scale bytes [K/32, rows], unpadded — with no
    transposes anywhere (the fast path for QuantizedLinear).

    Reference: fusedQuantizeMx (qutlass/__init__.py:149-180),
    epilogue math epilogue_quant.h:462-575.
    """
    k = a.shape[-1]
    rows = a.size // k
    x2 = a.reshape(rows, k)
    bm, bk = quantize_tiles(rows, k)
    grid = (ceil_div(rows, bm), k // bk)
    pr, pc = round_up(rows, 128), round_up(k // 32, 4)
    kmajor = layout == "kmajor" or layout == "kmajor_codes"
    if layout == "kmajor_codes":
        kmajor = "codes"

    if kmajor == "codes":
        q_shape = jax.ShapeDtypeStruct((k, rows), jnp.uint8)
        q_spec = pl.BlockSpec((bk, bm), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)
    elif kmajor:
        q_shape = jax.ShapeDtypeStruct((k // 2, rows), jnp.uint8)
        q_spec = pl.BlockSpec((bk // 2, bm), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)
    else:
        q_shape = jax.ShapeDtypeStruct((rows, k // 2), jnp.uint8)
        q_spec = pl.BlockSpec((bm, bk // 2), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)

    out_shapes = [q_shape,
                  jax.ShapeDtypeStruct((k // 32, rows), jnp.uint8)]
    out_specs = [q_spec,
                 pl.BlockSpec((bk // 32, bm), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)]
    if return_mask:
        out_shapes.append(jax.ShapeDtypeStruct((k // 8, rows), jnp.uint8))
        out_specs.append(pl.BlockSpec((bk // 8, bm), lambda i, j: (j, i),
                                      memory_space=pltpu.VMEM))

    res = pl.pallas_call(
        functools.partial(_quantize_mx_kernel, method=method,
                          emit_mask=return_mask, kmajor=kmajor),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(x2, _h128(h, rot_size))

    if kmajor:
        return res[:3] if return_mask else res[:2]
    packed = res[0].reshape(*a.shape[:-1], k // 2)
    scales = _pad_scales(res[1].T, pr, pc)
    if return_mask:
        return packed, scales, res[2].T.reshape(*a.shape[:-1], k // 8)
    return packed, scales


@functools.partial(jax.jit, static_argnames=("rot_size", "method", "layout"))
def fused_quantize_nv(a: jax.Array, h: jax.Array, global_scale: jax.Array, *,
                      rot_size: int, method: str = "abs_max",
                      layout: str = "rowmajor"):
    """Pallas fused NVFP4 quantize (group 16, e4m3 scale bytes)."""
    k = a.shape[-1]
    rows = a.size // k
    x2 = a.reshape(rows, k)
    bm, bk = quantize_tiles(rows, k)
    grid = (ceil_div(rows, bm), k // bk)
    pr, pc = round_up(rows, 128), round_up(k // 16, 4)
    kmajor = layout == "kmajor"

    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)

    if kmajor:
        q_shape = jax.ShapeDtypeStruct((k // 2, rows), jnp.uint8)
        q_spec = pl.BlockSpec((bk // 2, bm), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)
    else:
        q_shape = jax.ShapeDtypeStruct((rows, k // 2), jnp.uint8)
        q_spec = pl.BlockSpec((bm, bk // 2), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)

    res = pl.pallas_call(
        functools.partial(_quantize_nv_kernel, method=method, kmajor=kmajor),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            q_spec,
            pl.BlockSpec((bk // 16, bm), lambda i, j: (j, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            q_shape,
            jax.ShapeDtypeStruct((k // 16, rows), jnp.uint8),   # K-major
        ],
    )(gs, x2, _h128(h, rot_size))

    if kmajor:
        return res[0], res[1]
    return res[0].reshape(*a.shape[:-1], k // 2), _pad_scales(res[1].T, pr, pc)


# ---------------------------------------------------------------------------
# fused quantize -> int8-MXU operand (the production activation path)
# ---------------------------------------------------------------------------
#
# The int8 evaluator (ops/int8path.py) needs each row's max group
# exponent (MX) / max |dequant value| (NV) over ALL of K before any
# element can be emitted, so a K-tiled quantize must be followed by a
# second full-tensor encode pass (~10 MB write + ~12 MB read at
# M=2048 K=5120 — measured 64-80 us on top of the quantize).  These
# kernels fuse the two: the int8 output block spans the WHOLE K
# ([K, bm], index map ignores the K grid axis, so the block stays
# VMEM-resident and is revisited), each K-step stores raw e2m1 codes
# into it and accumulates the per-row running statistic in scratch,
# and the final K-step reads the codes back, applies the row rescale,
# and overwrites the block with the finished int8 operand — one HBM
# write of the operand instead of codes-out + codes-in + int8-out.
#
# Bitwise contract: identical to fused_quantize_{mx,nv}(kmajor) +
# encode_{int8,nv_int8} (the XLA emulation twins) — same codec
# formulas from formats/codecs.py, same bf16/f32 rounding points.
# Reference counterpart: the reference quantizes and GEMMs in separate
# launches too (fused_quantize_mx.cu -> gemm.cu); this fusion is the
# TPU-side improvement the revisit-capable Pallas pipeline allows.
#
# MEASURED OUTCOME (v5e, K=N=5120; exp_fused_int8_quant2.py): as a
# standalone quantize+encode the fusion wins clearly at M <= 256
# (7.8 vs 23.8 us at M=16, 13.4 vs 25.6 at M=256) — use it when the
# operand is the product (TP collectives, caching).  Composed with the
# int8 GEMM in one jit it does NOT win (458 vs 436 us at M=2048): XLA
# overlaps the separate encode's VPU work under the MXU dot (436 <
# 499 sum-of-parts), while the in-kernel rescale serializes against
# the quantize.  models/_linear therefore keeps the two-pass
# composition; this op is public API for operand producers.

def _rotate_chunk_t(x_ref, h, c0: int, w: int):
    """Rotate columns [c0, c0+w) of the row-major block -> [w, bm] f32.

    Static offsets; each 128-wide slice feeds the MXU with H^T on the
    left (dot_general contracting x's lane dim), so the K-major
    orientation comes out of the systolic array directly — no explicit
    bf16 transpose (measured 5 us cheaper than transpose-then-dot at
    M=2048 K=5120, exp_quant_anatomy_r3.py).
    """
    blocks = [lax.dot_general(h, x_ref[:, c0 + g * 128:c0 + (g + 1) * 128],
                              (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
              for g in range(w // 128)]
    return jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]


def _quantize_mx_int8_oneshot_kernel(x_ref, h_ref, a_ref, s_ref, sa_ref,
                                     *, method, k):
    """Single-shot whole-K quantize -> int8 operand (no revisit, no
    separate encode pass).

    The grid runs over row blocks only; all of K sits in this one
    invocation, so the row's max group exponent is known in-block and
    the finished int8 operand is emitted directly — one HBM write,
    no e2m1-codes round trip.  Pass A rotates chunk-wise and computes
    the scale bytes; pass B RE-ROTATES each chunk and emits int8.
    Recomputing the rotation beats stashing it: the extra MXU work
    (~13 us at M=2048 K=5120) is cheaper than the f32 scratch
    round-trip (~24 us) — exp_oneshot_variants_r3.py: recompute 119 us
    vs scratch 143 vs two-pass 145.

    Bitwise contract: identical to ``fused_quantize_mx(kmajor_codes)``
    + ``ops.int8path.encode_int8`` — same group-sum tree (sublane
    axis), same codec formulas, same f32 rounding points (the pow2
    rescale of a 4-bit integer is exact in f32 and bf16 alike for
    deficits d <= 3 and RTNE-rounds deeper), and the re-rotation is
    the identical MXU contraction both times.

    NOT an integer shift: ``m2 << (3 - d)`` looks equivalent but is
    only exact for d <= 3 — ACTIVATION rows carry no spread guarantee
    (unlike weights, which fall back to fp4 at deficit > 3), and a
    measured 1-in-64 decode row on the tiny model reaches d in 4..7,
    where the shift count goes negative and the contract breaks
    (maxdiff 6 vs encode_int8 at spread 5 — this session's adversarial
    probe).  The f32 multiply+round handles every deficit exactly like
    the encode.
    """
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 32
    # per-chunk loop emits only the group moments; the scale pipeline
    # runs once over the stacked [k/32, bm] arrays (per-chunk slivers
    # inside the unrolled loop are per-op-overhead-bound — measured on
    # the NV twin, results_nv_anatomy_r5.log)
    m1_chunks, m2_chunks = [], []
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)     # [bkc, bm] f32
        g = xt.reshape(gc, 32, bm)
        if method == "quest":
            m1_chunks.append(jnp.sum(g, axis=1))
            m2_chunks.append(jnp.sum(g * g, axis=1))
        else:
            m1_chunks.append(jnp.max(jnp.abs(g), axis=1))

    def _cat(chunks):
        return (jnp.concatenate(chunks, axis=0) if len(chunks) > 1
                else chunks[0])

    if method == "quest":
        scale = C.mx_scale_quest(_cat(m1_chunks), _cat(m2_chunks), 32.0)
    else:
        scale = C.mx_scale_absmax(_cat(m1_chunks))
    _, byte = C.pow2_floor_e8m0(scale)           # [k/32, bm]
    e = jnp.max(byte, axis=0, keepdims=True)     # [1, bm] row max byte
    inv = C.e8m0_recip_f32(byte)
    # m * 2^(3-d) is exact f32 for d <= 3 and RTNE-rounds deeper — same
    # argument as the revisit kernel's finish
    f = C.pow2_f32(3 - (e - byte))
    s_ref[...] = byte.astype(jnp.uint8)
    sa_ref[...] = C.pow2_f32(e - 131)            # exact 2^(E-4)

    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        q = (xt.reshape(gc, 32, bm) * inv[c * gc:(c + 1) * gc][:, None, :]
             ).reshape(bkc, bm)
        if method != "quest":
            q = q * 3.0
        # codes round-trip, NOT codecs.e2m1_rtne_m2_f32: the value-
        # domain RTNE (3 lax.round) measured 4-5% SLOWER than the
        # integer-domain codes path on v5e Mosaic (577 -> 601 us at
        # M=2048 K=25600, results_oneshot_largek_r5_m2.log)
        m2 = C.e2m1_codes_to_m2(C.e2m1_rtne_codes(q)).astype(jnp.float32)
        a = jnp.round((m2.reshape(gc, 32, bm)
                       * f[c * gc:(c + 1) * gc][:, None, :]).reshape(bkc, bm))
        a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32).astype(jnp.int8)


def _quantize_mx_int8_kernel(x_ref, h_ref, a_ref, s_ref, sa_ref, emax,
                             *, method, nk):
    j = pl.program_id(1)
    bm, bk = x_ref.shape
    xt = _rotate_tile_t(x_ref[...], h_ref[...])  # [bk, bm] f32, K on sublanes
    g = xt.reshape(bk // 32, 32, bm)

    if method == "quest":
        scale = C.mx_scale_quest(jnp.sum(g, axis=1), jnp.sum(g * g, axis=1),
                                 32.0)
    else:
        scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))
    _, byte = C.pow2_floor_e8m0(scale)          # i32 [bk/32, bm]
    inv = C.e8m0_recip_f32(byte)
    q = (g * inv[:, None, :]).reshape(bk, bm)
    if method != "quest":
        q = q * 3.0
    codes = C.e2m1_rtne_codes(q)                # i32 [bk, bm]

    a_ref[pl.ds(j * bk, bk), :] = codes.astype(jnp.int8)
    s_ref[pl.ds(j * (bk // 32), bk // 32), :] = byte.astype(jnp.uint8)
    tmax = jnp.max(byte, axis=0, keepdims=True)  # [1, bm] byte-domain

    @pl.when(j == 0)
    def _init():
        emax[...] = tmax

    @pl.when(j > 0)
    def _acc():
        emax[...] = jnp.maximum(emax[...], tmax)

    @pl.when(j == nk - 1)
    def _finish():
        e = emax[...]                            # [1, bm] row max byte

        # chunk the rescale over K (bk at a time): the f32 working set
        # stays ~bk*bm instead of the full k*bm (13 MB at K=25600 —
        # over VMEM).  Once E is known the rescale is elementwise.
        def body(c, _):
            seb = s_ref[pl.ds(c * (bk // 32), bk // 32), :
                        ].astype(jnp.int32)
            # m * 2^(3-d): pow2 scaling of a 4-bit integer never
            # rounds in EITHER bf16 or f32 (significand preserved,
            # only the exponent moves), so this f32 form is bitwise
            # identical to the emulation's bf16 form
            # (ops/int8path.encode_int8) down to the d > 133 underflow
            # regime, unreachable through the floored e8m0 quantizer.
            # f32 because Mosaic lowers neither bf16 roundeven nor the
            # bf16 [G, 1, bm] broadcast.
            mult = C.pow2_f32(3 - (e - seb))
            m = C.e2m1_codes_to_m2(
                a_ref[pl.ds(c * bk, bk), :].astype(jnp.int32)
            ).astype(jnp.float32)
            q2 = (m.reshape(bk // 32, 32, bm)
                  * mult[:, None, :]).reshape(bk, bm)
            r = jnp.round(q2)                    # exact small ints
            a_ref[pl.ds(c * bk, bk), :] = r.astype(jnp.int32
                                                   ).astype(jnp.int8)
            return 0

        lax.fori_loop(0, nk, body, 0)
        sa_ref[...] = C.pow2_f32(e - 131)            # exact 2^(E-4)


def _quantize_nv_int8_oneshot_kernel(gs_ref, x_ref, h_ref, a_ref, s_ref,
                                     sg_ref, *, method, k):
    """Single-shot whole-K NVFP4 quantize -> int8 operand.

    Same structure as the MX oneshot (grid over row blocks, rotation
    recomputed in pass B).  Pass A needs no codes at all: within a
    group, ``|v|`` is maximal at the group amax because the e2m1 RTNE
    rounding is monotone in |q|, so the row max dequant value is
    ``max_g 0.5 * s_g * m2(amax_g * mul_g)`` — computed on the [K/16,
    bm] group arrays (1/16 the elements).  A NaN byte zeroes ``s_g``
    exactly like the emulation's per-element path, so the shortcut is
    bitwise-faithful there too.

    Bitwise contract: identical to ``fused_quantize_nv(kmajor)`` +
    ``ops.int8path.encode_nv_int8``.
    """
    bm = x_ref.shape[0]
    h = h_ref[...]
    bkc = next(b for b in (512, 384, 256, 128) if k % b == 0)
    gc = bkc // 16
    # Pass A phase 1: only the cheap per-chunk group moments.  The
    # whole scale pipeline then runs ONCE over the stacked [K/16, bm]
    # arrays — running it per chunk on [gc, bm] slivers inside the
    # fully-unrolled chunk loop cost ~450 us of per-op overhead at
    # K=25600 (e4m3 encode alone; benchmarks/results_nv_anatomy_r5.log
    # e4m3lite vs prod), ~40% of the whole kernel.
    amax_chunks, s1_chunks, s2_chunks = [], [], []
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)     # [bkc, bm] f32
        g = xt.reshape(gc, 16, bm)
        amax_chunks.append(jnp.max(jnp.abs(g), axis=1))  # [gc, bm]
        if method == "quest":
            s1_chunks.append(jnp.sum(g, axis=1))
            s2_chunks.append(jnp.sum(g * g, axis=1))

    def _cat(chunks):
        return (jnp.concatenate(chunks, axis=0) if len(chunks) > 1
                else chunks[0])

    amax = _cat(amax_chunks)                             # [k/16, bm]
    if method == "quest":
        byte, mul = C.nv_quest_scale_bytes(_cat(s1_chunks), _cat(s2_chunks))
    else:
        byte, mul = C.nv_absmax_scale_bytes(amax, gs_ref[0, 0])
    s = C.e4m3_decode_f32(byte.astype(jnp.int32))
    s = jnp.where(jnp.isnan(s), 0.0, s)
    m2max = C.e2m1_codes_to_m2(
        C.e2m1_rtne_codes(amax * mul)).astype(jnp.float32)
    hs = 0.5 * s                                 # exact pow2 multiply
    vmax = jnp.max(hs * m2max, axis=0, keepdims=True)    # [1, bm]
    sigma = vmax / 127.0                                 # [1, bm]
    inv = jnp.where(sigma > 0, 1.0 / sigma, 0.0)
    s_ref[...] = byte.astype(jnp.uint8)
    sg_ref[...] = sigma
    for c in range(k // bkc):
        xt = _rotate_chunk_t(x_ref, h, c * bkc, bkc)
        q = (xt.reshape(gc, 16, bm) * mul[c * gc:(c + 1) * gc][:, None, :]
             ).reshape(bkc, bm)
        # codes round-trip (integer-domain beats lax.round on Mosaic —
        # see the MX oneshot note; the +1.5*2^23 magic-add round also
        # measured SLOWER than jnp.round here, results_nv_anatomy_r5)
        m2 = C.e2m1_codes_to_m2(C.e2m1_rtne_codes(q)).astype(jnp.float32)
        v = (m2.reshape(gc, 16, bm)
             * hs[c * gc:(c + 1) * gc][:, None, :]).reshape(bkc, bm)
        a = jnp.round(v * inv)
        a_ref[c * bkc:(c + 1) * bkc, :] = a.astype(jnp.int32).astype(jnp.int8)


def _quantize_nv_int8_kernel(gs_ref, x_ref, h_ref, a_ref, s_ref, sg_ref,
                             vmax, *, method, nk):
    j = pl.program_id(1)
    bm, bk = x_ref.shape
    xt = _rotate_tile_t(x_ref[...], h_ref[...])
    g = xt.reshape(bk // 16, 16, bm)

    if method == "quest":
        byte, mul = C.nv_quest_scale_bytes(jnp.sum(g, axis=1),
                                           jnp.sum(g * g, axis=1))
    else:
        byte, mul = C.nv_absmax_scale_bytes(jnp.max(jnp.abs(g), axis=1),
                                            gs_ref[0, 0])
    q = (g * mul[:, None, :]).reshape(bk, bm)
    codes = C.e2m1_rtne_codes(q)

    a_ref[pl.ds(j * bk, bk), :] = codes.astype(jnp.int8)
    s_ref[pl.ds(j * (bk // 16), bk // 16), :] = byte.astype(jnp.uint8)
    # running per-row max |dequant value| (exact f32: both factors have
    # 4-bit significands) — mirrors ops/int8path.encode_nv_int8
    s = C.e4m3_decode_f32(byte.astype(jnp.int32))
    s = jnp.where(jnp.isnan(s), 0.0, s)
    m = C.e2m1_codes_to_m2(codes).astype(jnp.float32)
    v = (m.reshape(bk // 16, 16, bm) * (0.5 * s)[:, None, :]).reshape(bk, bm)
    tmax = jnp.max(jnp.abs(v), axis=0, keepdims=True)

    @pl.when(j == 0)
    def _init():
        vmax[...] = tmax

    @pl.when(j > 0)
    def _acc():
        vmax[...] = jnp.maximum(vmax[...], tmax)

    @pl.when(j == nk - 1)
    def _finish():
        sigma = vmax[...] / 127.0                # [1, bm]
        inv = jnp.where(sigma > 0, 1.0 / sigma, 0.0)

        # chunked over K like the MX finish (VMEM: ~bk*bm f32, not k*bm)
        def body(c, _):
            sb = s_ref[pl.ds(c * (bk // 16), bk // 16), :
                       ].astype(jnp.int32)
            s_c = C.e4m3_decode_f32(sb)
            s_c = jnp.where(jnp.isnan(s_c), 0.0, s_c)
            m_c = C.e2m1_codes_to_m2(
                a_ref[pl.ds(c * bk, bk), :].astype(jnp.int32)
            ).astype(jnp.float32)
            v_c = (m_c.reshape(bk // 16, 16, bm)
                   * (0.5 * s_c)[:, None, :]).reshape(bk, bm)
            a2 = jnp.round(v_c * inv)
            a_ref[pl.ds(c * bk, bk), :] = a2.astype(jnp.int32
                                                    ).astype(jnp.int8)
            return 0

        lax.fori_loop(0, nk, body, 0)
        sg_ref[...] = sigma


def _int8_tiles_infeasible(rows: int, k: int, bm: int, bk: int) -> bool:
    """True when no lane-legal, VMEM-fitting bm exists for the fused
    quantize+int8 kernels (the [k, bm] out block is double-buffered
    with ~3 live f32 [bk, bm] intermediates): lane-illegal bm (huge K
    halved below 128), or rows the halving loop couldn't shrink (odd,
    or the bm=8 floor) still over the budget.  Callers compose the
    bitwise-equal two-pass path instead."""
    from .tuning import vmem_budgets

    if bm % 128 != 0 and bm != rows:
        return True
    _, tile_cap = vmem_budgets()
    return 2 * k * bm + 12 * bk * bm > tile_cap


def _int8_out_specs(k, rows, bm, gs):
    """(out_shapes, out_specs) shared by both fused-int8 quantizers:
    full-K revisited int8 operand, full-K scale bytes, [1, rows] row
    scale."""
    return (
        [jax.ShapeDtypeStruct((k, rows), jnp.int8),
         jax.ShapeDtypeStruct((k // gs, rows), jnp.uint8),
         jax.ShapeDtypeStruct((1, rows), jnp.float32)],
        [pl.BlockSpec((k, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
         pl.BlockSpec((k // gs, bm), lambda i, j: (0, i),
                      memory_space=pltpu.VMEM),
         pl.BlockSpec((1, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM)],
    )


@functools.partial(jax.jit, static_argnames=("rot_size", "method"))
def fused_quantize_mx_int8(a: jax.Array, h: jax.Array, *, rot_size: int,
                           method: str = "quest"):
    """Fused MXFP4 quantize + int8-MXU encode (one kernel, one pass).

    Returns (a' int8 [K, rows] natural K order, row_scale f32 [rows]
    = 2^(E-4), scale bytes u8 [K/32, rows]).  Bitwise equal to
    ``fused_quantize_mx(layout="kmajor_codes")`` +
    ``ops.int8path.encode_int8(kmajor=True)``.
    """
    k = a.shape[-1]
    rows = a.size // k
    x2 = a.reshape(rows, k)
    bm1 = quantize_int8_oneshot_bm(rows, k)
    if bm1:
        out_shapes = [jax.ShapeDtypeStruct((k, rows), jnp.int8),
                      jax.ShapeDtypeStruct((k // 32, rows), jnp.uint8),
                      jax.ShapeDtypeStruct((1, rows), jnp.float32)]
        out_specs = [
            pl.BlockSpec((k, bm1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 32, bm1), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm1), lambda i: (0, i),
                         memory_space=pltpu.VMEM)]
        ai, sb, sa = pl.pallas_call(
            functools.partial(_quantize_mx_int8_oneshot_kernel,
                              method=method, k=k),
            grid=(ceil_div(rows, bm1),),
            in_specs=[
                pl.BlockSpec((bm1, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=oneshot_vmem_limit(k, bm1)),
        )(x2, _h128(h, rot_size))
        return ai, sa.reshape(rows), sb
    bm, bk = quantize_int8_tiles(rows, k)
    if _int8_tiles_infeasible(rows, k, bm, bk):
        # no lane-legal bm fits the double-buffered [k, bm] out block
        # in VMEM (huge K, or odd/tiny rows that the halving loop
        # can't shrink) — compose the (bitwise-equal) two passes
        from ..ops import int8path as I8
        cq, cs = fused_quantize_mx(a, h, rot_size=rot_size, method=method,
                                   layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return ai, sa, cs
    nk = k // bk
    grid = (ceil_div(rows, bm), nk)
    out_shapes, out_specs = _int8_out_specs(k, rows, bm, 32)
    ai, sb, sa = pl.pallas_call(
        functools.partial(_quantize_mx_int8_kernel, method=method, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((1, bm), jnp.int32)],
    )(x2, _h128(h, rot_size))
    return ai, sa.reshape(rows), sb


@functools.partial(jax.jit, static_argnames=("rot_size", "method"))
def fused_quantize_nv_int8(a: jax.Array, h: jax.Array,
                           global_scale: jax.Array, *, rot_size: int,
                           method: str = "abs_max"):
    """Fused NVFP4 quantize + int8-MXU encode (bounded rounding).

    Returns (a' int8 [K, rows] natural K order, sigma f32 [rows],
    scale bytes u8 [K/16, rows]).  Bitwise equal to
    ``fused_quantize_nv(layout="kmajor")`` +
    ``ops.int8path.encode_nv_int8``.
    """
    k = a.shape[-1]
    rows = a.size // k
    x2 = a.reshape(rows, k)
    bm1 = quantize_int8_oneshot_bm(rows, k)
    if bm1:
        gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
        out_shapes = [jax.ShapeDtypeStruct((k, rows), jnp.int8),
                      jax.ShapeDtypeStruct((k // 16, rows), jnp.uint8),
                      jax.ShapeDtypeStruct((1, rows), jnp.float32)]
        out_specs = [
            pl.BlockSpec((k, bm1), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k // 16, bm1), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm1), lambda i: (0, i),
                         memory_space=pltpu.VMEM)]
        ai, sb, sg = pl.pallas_call(
            functools.partial(_quantize_nv_int8_oneshot_kernel,
                              method=method, k=k),
            grid=(ceil_div(rows, bm1),),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((bm1, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=oneshot_vmem_limit(k, bm1)),
        )(gs, x2, _h128(h, rot_size))
        return ai, sg.reshape(rows), sb
    bm, bk = quantize_int8_tiles(rows, k)
    if _int8_tiles_infeasible(rows, k, bm, bk):
        # no lane-legal, VMEM-fitting bm — compose the two passes
        from ..ops import int8path as I8
        wqt, wst = fused_quantize_nv(a, h, global_scale,
                                     rot_size=rot_size, method=method,
                                     layout="kmajor")
        ai, sg = I8.encode_nv_int8(wqt, wst)
        return ai, sg, wst
    nk = k // bk
    grid = (ceil_div(rows, bm), nk)
    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)
    out_shapes, out_specs = _int8_out_specs(k, rows, bm, 16)
    ai, sb, sg = pl.pallas_call(
        functools.partial(_quantize_nv_int8_kernel, method=method, nk=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((1, bm), jnp.float32)],
    )(gs, x2, _h128(h, rot_size))
    return ai, sg.reshape(rows), sb
