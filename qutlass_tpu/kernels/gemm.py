"""Pallas TPU kernels: block-scaled GEMMs (MXFP4 / NVFP4 / MXFP8).

One kernel family replaces the reference's CUTLASS block-scaled GEMMs
(gemm.cu:40-434) *and* the hand-rolled small-batch "ada" PTX kernel
(gemm_ada.cu, arch/mma_mx_sm120.h) — on TPU the same kernel covers both
regimes via the tile table (kernels/tuning.py), and scales are consumed
row-major with no swizzle (SURVEY.md §2.5/§2.6).

Internal layout: operands are fed K-major ([K/2, M] packed nibbles,
[K/gs, M] scale bytes) so that
  * per-group scales broadcast along *sublanes* (cheap),
  * fp4 nibble planes (even/odd K) decode without interleaving — the
    contraction is order-invariant so even and odd planes are reduced by
    two MXU calls per K block,
  * dequantized values are exact bf16 (power-of-two e8m0 scales fold
    into the exponent field; e4m3 x e2m1 products fit bf16's mantissa),
    keeping the GEMM bit-identical to an fp64 dequantized matmul.
Accumulation is fp32 in VMEM scratch across the K grid dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import codecs as C
from ..utils import ceil_div
from .tuning import gemm_tiles


def _expand_scales(sbytes_i32, group: int):
    """[G, m] scale bytes -> [G*group, m] via sublane broadcast."""
    g, m = sbytes_i32.shape
    return jnp.broadcast_to(sbytes_i32[:, None, :], (g, group, m)).reshape(
        g * group, m)


def _unpack_interleaved(pk_ref):
    """Packed u8 [bk/2, m] -> e2m1 codes i32 [bk, m] in natural K order.

    The inverse of the quantizer's sublane-pair pack: widen each byte to
    u16 with the nibbles in separate bytes, then bitcast u16 -> u8 to
    double the sublane count (little-endian puts the low nibble at row
    2k, the high nibble at row 2k+1 — exactly the original K order).
    """
    v = pk_ref[...].astype(jnp.int32)
    u16 = ((v & 0xF) | ((v & 0xF0) << 4)).astype(jnp.uint16)
    return pltpu.bitcast(u16, jnp.uint8).astype(jnp.int32)


def _swar_decode_bf16(v, sbm, shift=12):
    """SWAR fp4 decode: both nibbles of each byte in one i32 lane.

    ``v``: packed bytes widened to i32 [bk/2, m].  ``sbm``: per-lane
    i32 holding (e8m0_byte - 1) << 7 in the LOW half only (the two
    nibbles of a byte are consecutive K elements, hence always the same
    scale group).  Builds the two scaled bf16 bit patterns in the two
    halves of the word — every VPU op processes two elements — then one
    32->16 bitcast doubles the sublanes into natural K order
    (little-endian: row 2k = low half = low nibble).

    Per 16-bit half with code c = [s e1 e0 m]:
      bf16 bits = ((e | m-if-e!=0) << 6) + nonzero * ((scale_byte-1) << 7)
    i.e. exp_field = e + scale_byte - 1, mant bit6 = m — which covers
    the whole nonzero grid incl. code 1 (0.5, via e = 0); codes 0/8
    flush to +/-0 because the scale term is multiplied by the nonzero
    flag ``u`` (one 32-bit multiply replaces the mask dance: with the
    scale in the low half only, sbm*(u0 + u1<<16) = sbm*u0 + (sbm*u1)<<16
    exactly — sbm*u0 < 2^16, no cross-half carry).  ``c`` skips the
    nibble isolation mask: every later use masks the stray bits itself.
    Exact for scale bytes in [1, 254] with in-range products — the only
    values the quantizers emit (docs/NUMERICS.md).
    """
    c = v | (v << shift)                     # codes in halves 0 and 16
    t = ((c >> 1) | (c >> 2)) & 0x10001      # 1 iff e != 0
    u = (t | c) & 0x10001                    # 1 iff code not in {0, 8}
    bits = ((c & (t | 0x60006)) << 6) + sbm * u
    bits = bits | ((c & 0x80008) << 12)
    return pltpu.bitcast(pltpu.bitcast(bits, jnp.uint16), jnp.bfloat16)


def _dequant_fp4_mx(pk, sf):
    """Packed [bk/2, m] u8 + e8m0 [bk/32, m] -> bf16 [bk, m] (exact)."""
    pk, sf = pk[...], sf[...]
    sb = sf.astype(jnp.int32)
    sbm = _expand_scales((sb - 1) * 0x80, 16)
    return _swar_decode_bf16(pk.astype(jnp.int32), sbm)


def _dequant_fp4_mx_codes(ck, sf):
    """Unpacked codes u8 [bk, m] + e8m0 [bk/32, m] -> bf16 [bk, m].

    The activation-side fast layout: the quantizer skips nibble
    packing; a sublane-pair bitcast puts rows 2k/2k+1 in one u16 (low
    byte = row 2k) and the same SWAR tail decodes both — identical op
    count to the packed path, with the pack stage deleted upstream.
    """
    u16 = pltpu.bitcast(ck[...], jnp.uint16)     # [bk/2, m] row pairs
    v = u16.astype(jnp.int32)
    sb = sf[...].astype(jnp.int32)
    sbm = _expand_scales((sb - 1) * 0x80, 16)
    return _swar_decode_bf16(v, sbm, shift=8)


def _dequant_fp4_nv(pk, sf):
    """Packed fp4 + e4m3 scales [bk/16, m] -> bf16 [bk, m].

    Grid values decode unscaled (constant exponent base) via the SWAR
    path; the e4m3 scale is exact in bf16 and the product has a <=6-bit
    significand, so one bf16 multiply keeps the result exact.
    """
    pk, sf = pk[...], sf[...]
    vals = _swar_decode_bf16(pk.astype(jnp.int32), jnp.int32(126 * 0x80))
    # expand the f32 scales (32-bit sublane broadcast — the bf16 form
    # hits an unsupported Mosaic shape cast at some geometries); the
    # f32 product of exact values downcasts to bf16 exactly
    sfd = C.e4m3_decode_f32(sf.astype(jnp.int32))
    return (vals * _expand_scales(sfd, 16)).astype(jnp.bfloat16)


_KDIM = (((0,), (0,)), ((), ()))  # contract sublane (K) dim of both operands


def _gemm_fp4_kernel(alpha_ref, a_ref, b_ref, asf_ref, bsf_ref, o_ref, acc,
                     *, fmt, split=1, a_codes=False):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    dq = _dequant_fp4_mx if fmt == "mx" else _dequant_fp4_nv
    dqa = _dequant_fp4_mx_codes if a_codes else dq
    # static sub-K split: the decode of chunk s+1 is independent of the
    # MXU dot of chunk s, letting Mosaic overlap VPU and MXU work
    kp = a_ref.shape[0]
    gp = asf_ref.shape[0]
    for s in range(split):
        ks, gs_ = kp // split, gp // split
        av = dqa(a_ref[s * ks:(s + 1) * ks], asf_ref[s * gs_:(s + 1) * gs_])
        bv = dq(b_ref[s * ks:(s + 1) * ks], bsf_ref[s * gs_:(s + 1) * gs_])
        acc[...] += jax.lax.dot_general(av, bv, _KDIM,
                                        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _fin():
        o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(o_ref.dtype)


def _gemm_fp8_kernel(alpha_ref, a_ref, b_ref, asf_ref, bsf_ref, o_ref, acc):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    sa = _expand_scales(asf_ref[...].astype(jnp.int32), 32)
    sb = _expand_scales(bsf_ref[...].astype(jnp.int32), 32)
    av = C.e4m3_decode_scaled_bf16(a_ref[...].astype(jnp.int32), sa)
    bv = C.e4m3_decode_scaled_bf16(b_ref[...].astype(jnp.int32), sb)
    acc[...] += jax.lax.dot_general(av, bv, _KDIM,
                                    preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _fin():
        o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(o_ref.dtype)


def _run_gemm(kernel, at, bt, asft, bsft, alpha, m, n, k, bk, gs_pack,
              out_dtype=jnp.bfloat16):
    """Launch a K-major block-scaled GEMM.  ``gs_pack`` = scale rows per bk.

    Degenerate lane dims (m or n < 8) are zero-padded to 8 — Mosaic
    accepts 1-lane blocks in principle but compilation of the SWAR
    decode on them is pathological (observed: M=1 never finishes).
    """
    mp, npd = max(m, 8), max(n, 8)
    if mp != m:
        at = jnp.pad(at, ((0, 0), (0, mp - m)))
        asft = jnp.pad(asft, ((0, 0), (0, mp - m)))
    if npd != n:
        bt = jnp.pad(bt, ((0, 0), (0, npd - n)))
        bsft = jnp.pad(bsft, ((0, 0), (0, npd - n)))
    bm, bn, _ = gemm_tiles(mp, npd, k, packed=True)
    grid = (ceil_div(mp, bm), ceil_div(npd, bn), k // bk)
    # per-operand packing: bk/2 rows for packed fp4, bk for fp8 or
    # unpacked codes (the layouts may differ between A and B)
    bkp_a = at.shape[0] * bk // k
    bkp_b = bt.shape[0] * bk // k

    scratch = [pltpu.VMEM((bm, bn), jnp.float32)]

    alpha2 = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, kk: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bkp_a, bm), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bkp_b, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs_pack, bm), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((gs_pack, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, npd), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(alpha2, at, bt, asft, bsft)
    return out if (mp, npd) == (m, n) else out[:m, :n]


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_mxf4_bf16_tn(a, b, a_sf, b_sf, alpha, out_dtype=jnp.bfloat16):
    """Pallas W4A4 MXFP4 GEMM (reference gemm.cu:174-248 / gemm_ada.cu)."""
    m, n = a.shape[0], b.shape[0]
    k = a.shape[1] * 2
    _, _, bk = gemm_tiles(m, n, k, packed=True)
    return _run_gemm(functools.partial(_gemm_fp4_kernel, fmt="mx"),
                     a.T, b.T, a_sf.T, b_sf.T, alpha, m, n, k, bk, bk // 32, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_mxf4_bf16_kmajor(at, bt, a_sft, b_sft, alpha, out_dtype=jnp.bfloat16):
    """K-major fast path: operands as emitted by
    ``fused_quantize_mx(..., layout='kmajor')`` — zero layout transforms.

    at: u8 [K/2, M], bt: u8 [K/2, N], scales u8 [K/32, M] / [K/32, N].
    """
    k = at.shape[0] * 2
    m, n = at.shape[1], bt.shape[1]
    _, _, bk = gemm_tiles(m, n, k, packed=True)
    return _run_gemm(functools.partial(_gemm_fp4_kernel, fmt="mx"),
                     at, bt, a_sft, b_sft, alpha, m, n, k, bk, bk // 32, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_mxf4_bf16_kmajor_codes(at, bt, a_sft, b_sft, alpha, out_dtype=jnp.bfloat16):
    """K-major GEMM with UNPACKED activation codes (internal fast path).

    at: u8 e2m1 codes [K, M] (from fused_quantize_mx layout=
    "kmajor_codes" — the quantizer skips nibble packing); bt: packed
    u8 [K/2, N]; scales as in matmul_mxf4_bf16_kmajor.  Bit-identical
    to the packed path.
    """
    k = at.shape[0]
    m, n = at.shape[1], bt.shape[1]
    _, _, bk = gemm_tiles(m, n, k, packed=True)
    return _run_gemm(
        functools.partial(_gemm_fp4_kernel, fmt="mx", a_codes=True),
        at, bt, a_sft, b_sft, alpha, m, n, k, bk, bk // 32, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_nvf4_bf16_tn(a, b, a_sf, b_sf, alpha, out_dtype=jnp.bfloat16):
    """Pallas NVFP4 GEMM (group 16, e4m3 scales; reference gemm.cu:250-326)."""
    m, n = a.shape[0], b.shape[0]
    k = a.shape[1] * 2
    _, _, bk = gemm_tiles(m, n, k, packed=True)
    return _run_gemm(functools.partial(_gemm_fp4_kernel, fmt="nv"),
                     a.T, b.T, a_sf.T, b_sf.T, alpha, m, n, k, bk, bk // 16, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_nvf4_bf16_kmajor(at, bt, a_sft, b_sft, alpha, out_dtype=jnp.bfloat16):
    """K-major NVFP4 fast path: at u8 [K/2, M], scales u8 [K/16, M]."""
    k = at.shape[0] * 2
    m, n = at.shape[1], bt.shape[1]
    _, _, bk = gemm_tiles(m, n, k, packed=True)
    return _run_gemm(functools.partial(_gemm_fp4_kernel, fmt="nv"),
                     at, bt, a_sft, b_sft, alpha, m, n, k, bk, bk // 16, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_mxf8_bf16_tn(a, b, a_sf, b_sf, alpha, out_dtype=jnp.bfloat16):
    """Pallas MXFP8 GEMM TN (reference gemm.cu:328-386)."""
    m, n, k = a.shape[0], b.shape[0], a.shape[1]
    _, _, bk = gemm_tiles(m, n, k, packed=False)
    return _run_gemm(_gemm_fp8_kernel, a.T, b.T, a_sf.T, b_sf.T, alpha,
                     m, n, k, bk, bk // 32, out_dtype=out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_mxf8_bf16_nn(a, b, a_sf, b_sf, alpha, out_dtype=jnp.bfloat16):
    """Pallas MXFP8 GEMM NN: ``a`` arrives K-major already (gemm.cu:388-434)."""
    k, m = a.shape
    n = b.shape[0]
    _, _, bk = gemm_tiles(m, n, k, packed=False)
    return _run_gemm(_gemm_fp8_kernel, a, b.T, a_sf.T, b_sf.T, alpha,
                     m, n, k, bk, bk // 32, out_dtype=out_dtype)
