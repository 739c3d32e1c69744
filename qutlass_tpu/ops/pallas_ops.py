"""Pallas-backed op implementations (TPU compiled path).

Forward quantize, the block-scaled GEMMs, and the QAT backward ops all
run as Mosaic kernels; shapes outside each kernel's constraints (noted
per function) route to the bit-compatible XLA emulation graph, and
batched inputs vmap the 2-D kernels.
"""
import jax

from ..kernels import backward as _bwd
from ..kernels.fused_linear import fused_linear_mxf4, fused_linear_nvf4
from ..kernels.gemm import (matmul_mxf4_bf16_kmajor,
                            matmul_mxf4_bf16_kmajor_codes, matmul_mxf4_bf16_tn,
                            matmul_mxf8_bf16_nn, matmul_mxf8_bf16_tn,
                            matmul_nvf4_bf16_kmajor, matmul_nvf4_bf16_tn)
from ..kernels.quantize import (fused_quantize_mx, fused_quantize_mx_int8,
                                fused_quantize_nv, fused_quantize_nv_int8)
from . import emulation as _emu
from .dispatch import note_fallback


def backward_t_bf16(x, h, *, rot_size: int = 32):
    """Pallas when N % 256 == 0 and K % 128 == 0; else XLA emulation."""
    n, k = x.shape[-2], x.shape[-1]
    if n % 256 != 0 or k % 128 != 0:
        note_fallback("backward_t_bf16", x.shape, "N%256==0 and K%128==0")
        return _emu.backward_t_bf16(x, h, rot_size=rot_size)
    fn = lambda xx: _bwd.backward_t_bf16_2d(xx, h, rot_size=rot_size)
    if x.ndim == 2:
        return fn(x)
    x3 = x.reshape(-1, n, k)
    pk, st = jax.vmap(fn)(x3)
    return (pk.reshape(*x.shape[:-2], k, n // 2),
            st.reshape(*x.shape[:-2], k, n // 32))


def backward_qt_bf16(x_e2m1, x_e8m0, h, alpha, *, rot_size: int = 32):
    """Pallas when M % 256 == 0 and N % 256 == 0; batched via vmap."""
    m = x_e2m1.shape[-2]
    n = x_e2m1.shape[-1] * 2
    if m % 256 != 0 or n % 256 != 0:
        note_fallback("backward_qt_bf16", x_e2m1.shape, "M%256==0 and N%256==0")
        return _emu.backward_qt_bf16(x_e2m1, x_e8m0, h, alpha,
                                     rot_size=rot_size)
    fn = lambda xq, xs: _bwd.backward_qt_bf16_2d(xq, xs, h, alpha,
                                                 rot_size=rot_size)
    if x_e2m1.ndim == 2:
        return fn(x_e2m1, x_e8m0)
    lead = x_e2m1.shape[:-2]
    xq3 = x_e2m1.reshape(-1, m, n // 2)
    xs3 = x_e8m0.reshape(-1, m, n // 32)
    pk, st = jax.vmap(fn)(xq3, xs3)
    return (pk.reshape(*lead, n, m // 2), st.reshape(*lead, n, m // 32))


def backward_bf16_square_double_mxfp8(x):
    m, n = x.shape
    if m % 256 != 0 or n % 32 != 0 or n > 16384:
        note_fallback("backward_bf16_square_double_mxfp8", x.shape,
                      "M%256==0, N%32==0, N<=16384")
        return _emu.backward_bf16_square_double_mxfp8(x)
    return _bwd.backward_bf16_square_double_mxfp8_2d(x)


def mxfp4_transpose_mxfp8(x_fp4, scales):
    m = x_fp4.shape[0]
    n = x_fp4.shape[1] * 2
    if m % 256 != 0 or n % 256 != 0:
        note_fallback("mxfp4_transpose_mxfp8", x_fp4.shape,
                      "M%256==0 and N%256==0")
        return _emu.mxfp4_transpose_mxfp8(x_fp4, scales)
    return _bwd.mxfp4_transpose_mxfp8_2d(x_fp4, scales)


def backward_square_double_scaled(x):
    """Scaled-bf16 square-double quantization (QAT fast path)."""
    m, n = x.shape
    if m % 256 != 0 or n % 32 != 0 or n > 16384:
        note_fallback("backward_square_double_scaled", x.shape,
                      "M%256==0, N%32==0, N<=16384")
        return _emu.backward_square_double_scaled(x)
    return _bwd.backward_square_double_scaled_2d(x)


def mxfp4_transpose_scaled(x_fp4, scales):
    """Scaled-bf16 dequant-transpose-requant (QAT fast path)."""
    m = x_fp4.shape[0]
    n = x_fp4.shape[1] * 2
    if m % 256 != 0 or n % 256 != 0:
        note_fallback("mxfp4_transpose_scaled", x_fp4.shape,
                      "M%256==0 and N%256==0")
        return _emu.mxfp4_transpose_scaled(x_fp4, scales)
    return _bwd.mxfp4_transpose_scaled_2d(x_fp4, scales)


def mxfp4_transpose_scaled_kmajor(qt, st):
    """K-major-input scaled transpose (QAT fast path)."""
    k = qt.shape[0] * 2
    rows = qt.shape[1]
    if k % 256 != 0 or rows % 256 != 0:
        note_fallback("mxfp4_transpose_scaled_kmajor", qt.shape,
                      "K%256==0 and rows%256==0")
        return _emu.mxfp4_transpose_scaled_kmajor(qt, st)
    return _bwd.mxfp4_transpose_scaled_kmajor_2d(qt, st)


__all__ = [
    "fused_quantize_mx", "fused_quantize_nv",
    "fused_quantize_mx_int8", "fused_quantize_nv_int8",
    "matmul_mxf4_bf16_tn", "matmul_mxf4_bf16_kmajor",
    "matmul_mxf4_bf16_kmajor_codes", "matmul_nvf4_bf16_tn",
    "matmul_nvf4_bf16_kmajor", "fused_linear_mxf4", "fused_linear_nvf4",
    "matmul_mxf8_bf16_tn", "matmul_mxf8_bf16_nn",
    "backward_t_bf16", "backward_qt_bf16",
    "backward_bf16_square_double_mxfp8", "mxfp4_transpose_mxfp8",
    "backward_square_double_scaled", "mxfp4_transpose_scaled",
    "mxfp4_transpose_scaled_kmajor",
]
