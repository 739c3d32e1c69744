"""Fully-fused quantized linear: rotate + quantize + W4A4 GEMM in ONE
Pallas kernel.

For decode / small-prefill shapes the unfused pipeline
(quantize kernel -> HBM -> GEMM kernel) pays an extra kernel launch and
an HBM round-trip for the quantized activations; here the whole
reference call stack (SURVEY.md §3.1 + §3.2) collapses into a single
launch.

Grid design (v2): (i, kk, j) with j (the N-blocks) innermost.  The
activation tile is quantize-dequantized ONCE per (i, kk) into VMEM
scratch when j == 0 and reused across every N-block — the v1 design
(k innermost) recomputed it per N-block, which measured slower than
the composed pipeline at every M.  Each j owns a slot of a stacked
f32 accumulator scratch, accumulated across kk and flushed to the
output at the last kk.

Numerics are identical to fusedQuantize* + matmul_*_kmajor: the
activation is rotated in bf16->fp32 on the MXU, quantized with the same
scale math, and the RTNE e2m1 grid value (times its scale) is
reconstructed exactly in bf16.  The abs-max MX variant folds the /9
dequant constant into alpha instead of dividing each operand by 3.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats import codecs as C
from ..utils import ceil_div
from .gemm import _KDIM, _dequant_fp4_mx, _dequant_fp4_nv
from .quantize import _h128, _rotate_tile_t
from .tuning import fused_linear_tiles

_RTNE = lax.RoundingMethod.TO_NEAREST_EVEN


def _rtne_e2m1_values(q):
    """RTNE of fp32 ``q`` onto the e2m1 grid, returned as grid *values*.

    Same rounding as e2m1_rtne_codes but skips the code round-trip.
    """
    # sign(NaN) is NaN and would defeat the isnan -> 0 mapping below
    # (e2m1_rtne_codes maps NaN to code 0; this must match bitwise)
    s = jnp.where(jnp.isnan(q), 0.0, jnp.sign(q))
    a = jnp.abs(q)
    a = jnp.where(jnp.isnan(a), 0.0, jnp.minimum(a, 6.0))
    v1 = lax.round(a * 2.0, _RTNE) * 0.5
    v2 = lax.round(a, _RTNE)
    v3 = lax.round(a * 0.5, _RTNE) * 2.0
    return s * jnp.where(a <= 2.0, v1, jnp.where(a <= 4.0, v2, v3))


def quantize_dequant_tile(x, h128, method):
    """[bm, bk] bf16 -> W4A4-quantized-then-dequantized bf16 [bk, bm].

    For abs-max the *3 stays folded in (caller divides by 9 via alpha).
    """
    bm, bk = x.shape
    xt = _rotate_tile_t(x, h128)
    g = xt.reshape(bk // 32, 32, bm)
    if method == "quest":
        s1 = jnp.sum(g, axis=1)
        s2 = jnp.sum(g * g, axis=1)
        scale = C.mx_scale_quest(s1, s2, 32.0)
    else:
        scale = C.mx_scale_absmax(jnp.max(jnp.abs(g), axis=1))
    scale_f, byte = C.pow2_floor_e8m0(scale)
    q = g * C.e8m0_recip_f32(byte)[:, None, :]
    if method != "quest":
        q = q * 3.0
    vals = _rtne_e2m1_values(q.reshape(bk, bm))
    # grid value x pow2 scale is exact in bf16
    sexp = jnp.broadcast_to(scale_f[:, None, :], (bk // 32, 32, bm)
                            ).reshape(bk, bm)
    return (vals * sexp).astype(jnp.bfloat16)


def quantize_dequant_tile_nv(x, h128, method, gscale):
    """[bm, bk] bf16 -> NVFP4-quantized-then-descaled bf16 [bk, bm].

    The emitted values are grid[code] * e4m3(scale) — exactly the
    operand the NVFP4 GEMM consumes (global-scale factors live in
    alpha, reference epilogue_quant.h:1650-1693).
    """
    bm, bk = x.shape
    g = _rotate_tile_t(x, h128).reshape(bk // 16, 16, bm)
    if method == "quest":
        s1 = jnp.sum(g, axis=1)
        s2 = jnp.sum(g * g, axis=1)
        byte, mul = C.nv_quest_scale_bytes(s1, s2)
    else:
        byte, mul = C.nv_absmax_scale_bytes(jnp.max(jnp.abs(g), axis=1),
                                            gscale)
    q = (g * mul[:, None, :]).reshape(bk, bm)
    vals = _rtne_e2m1_values(q)
    sq = C.e4m3_decode_f32(byte)
    sexp = jnp.broadcast_to(sq[:, None, :], (bk // 16, 16, bm)).reshape(bk, bm)
    # grid value x e4m3 scale has a <=6-bit significand: exact in bf16
    return (vals * sexp).astype(jnp.bfloat16)


def _fused_linear_kernel(alpha_ref, gs_ref, x_ref, h_ref, wq_ref, wsf_ref,
                         o_ref, accs, xdq, *, method, fmt):
    kk, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _quant():
        if fmt == "mx":
            xdq[...] = quantize_dequant_tile(x_ref[...], h_ref[...], method)
        else:
            xdq[...] = quantize_dequant_tile_nv(x_ref[...], h_ref[...],
                                                method, gs_ref[0, 0])

    @pl.when(kk == 0)
    def _init():
        accs[j] = jnp.zeros_like(accs[j])

    dq = _dequant_fp4_mx if fmt == "mx" else _dequant_fp4_nv
    wdq = dq(wq_ref, wsf_ref)
    accs[j] += jax.lax.dot_general(xdq[...], wdq, _KDIM,
                                   preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(1) - 1)
    def _fin():
        o_ref[...] = (accs[j] * alpha_ref[0, 0]).astype(jnp.bfloat16)


def _run_fused(x, wqt, wst, h, global_scale, alpha, rot_size, method, fmt,
               gs_group):
    m, k = x.shape
    n = wqt.shape[1]
    bm, bn, bk = fused_linear_tiles(m, n, k)
    nj = ceil_div(n, bn)
    grid = (ceil_div(m, bm), k // bk, nj)
    al = jnp.asarray(alpha, jnp.float32).reshape(1, 1)
    gs = jnp.asarray(global_scale, jnp.float32).reshape(1, 1)

    return pl.pallas_call(
        functools.partial(_fused_linear_kernel, method=method, fmt=fmt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, kk, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, kk, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, bk), lambda i, kk, j: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, kk, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, kk, j: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // gs_group, bn), lambda i, kk, j: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, kk, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((nj, bm, bn), jnp.float32),
                        pltpu.VMEM((bk, bm), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
    )(al, gs, x, _h128(h, rot_size), wqt, wst)


@functools.partial(jax.jit, static_argnames=("rot_size", "method"))
def fused_linear_mxf4(x, wqt, wst, h, alpha, *, rot_size: int,
                      method: str = "quest"):
    """y[M, N] = W4A4(x) @ dq(w)^T * alpha in one kernel launch.

    x: [M, K] bf16; wqt/wst: K-major quantized weight
    (fused_quantize_mx(..., layout='kmajor')); h: [gs, gs] rotation.
    """
    al = jnp.asarray(alpha, jnp.float32)
    if method != "quest":
        al = al * (1.0 / 9.0)
    return _run_fused(x, wqt, wst, h, 1.0, al, rot_size, method, "mx", 32)


@functools.partial(jax.jit, static_argnames=("rot_size", "method"))
def fused_linear_nvf4(x, wqt, wst, h, global_scale, alpha, *, rot_size: int,
                      method: str = "abs_max"):
    """Single-kernel NVFP4 linear: quantize x (group 16, e4m3 scales,
    activation ``global_scale``) and GEMM against a K-major weight.
    """
    return _run_fused(x, wqt, wst, h, global_scale, alpha, rot_size, method,
                      "nv", 16)
