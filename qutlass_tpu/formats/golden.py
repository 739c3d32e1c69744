"""fp64 golden (reference) quantizer models — the numerics specification.

Pure numpy ports of the reference's fp64 golden models
(tests/mxfp4_test.py:45-184, tests/nvfp4_test.py:42-170,
tests/quartet_test.py:28-173 and 284-366 in IST-DASLab/qutlass).
The kernels are validated against these: scales must match exactly,
quantized values up to the reference's tie-break mismatch budget.

Everything here runs on host in float64 — it is the test oracle and the
CPU reference backend, never a production path.
"""
from __future__ import annotations

import numpy as np

E2M1_GRID_POS = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])

# Ascending grid with negative-zero split, and the e2m1 codes of each
# entry, exactly as in the reference golden model (mxfp4_test.py:45-81).
_GRID = np.array([-6.0, -4.0, -3.0, -2.0, -1.5, -1.0, -0.5, -0.0,
                  0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0])
_GRID_INT = np.array([-1, -2, -3, -4, -5, -6, -7, -8,
                      0, 1, 2, 3, 4, 5, 6, 7], dtype=np.int64)

_GRID_DQ = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                     -0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0])


def rtne_fp4(x: np.ndarray):
    """RTNE onto the e2m1 grid with even-code tie-break.

    Returns (values fp64, packed uint8 with element 2i in the low nibble).
    Port of mxfp4_test.py:45-81.
    """
    x = np.asarray(x, dtype=np.float64)
    inds = np.searchsorted(_GRID, x, side="left")
    lo = np.clip(inds - 1, 0, 15)
    hi = np.clip(inds, 0, 15)
    g_lo, g_hi = _GRID[lo], _GRID[hi]
    pick_hi = (g_hi - x < x - g_lo) | ((g_hi - x == x - g_lo) & (_GRID_INT[hi] % 2 == 0))
    y = np.where(pick_hi, g_hi, g_lo)
    y_int = np.where(pick_hi, _GRID_INT[hi], _GRID_INT[lo]).astype(np.int64)
    packed = ((y_int[..., 1::2] & 0xF) << 4 | (y_int[..., ::2] & 0xF)).astype(np.uint8)
    return y, packed


def unpack_fp4(packed: np.ndarray) -> np.ndarray:
    """uint8 packed e2m1 -> fp64 values (element 2i from the low nibble)."""
    p = np.asarray(packed).astype(np.int64)
    un = np.stack([p & 0xF, (p >> 4) & 0xF], axis=-1).reshape(*p.shape[:-1], -1)
    return _GRID_DQ[un]


def dq_fp4(packed: np.ndarray, scale_bytes: np.ndarray, gs: int, alpha: float):
    """Dequantize packed e2m1 + e8m0 scale bytes -> fp64 (mxfp4_test.py:84-120)."""
    vals = unpack_fp4(packed)
    scales = e8m0_to_f64(scale_bytes)
    g = vals.reshape(*vals.shape[:-1], -1, gs)
    return (g * scales[..., None]).reshape(vals.shape) / alpha


def e8m0_to_f64(byte: np.ndarray) -> np.ndarray:
    b = np.asarray(byte).astype(np.int64)
    v = np.ldexp(1.0, b - 127)
    return np.where(b == 255, np.nan, v)


def e8m0_from_pow2_f64(p: np.ndarray) -> np.ndarray:
    """Encode an exact power of two (or 0/inf edge) as an e8m0 byte.

    Mirrors torch's float8_e8m0fnu cast of ``log2().floor().exp2()``
    outputs: clamps below 2^-127 to byte 0 and above 2^127 to byte 254.
    """
    p = np.asarray(p, dtype=np.float64)
    with np.errstate(divide="ignore"):
        e = np.floor(np.log2(np.where(p > 0, p, 2.0 ** -127)))
    return np.clip(e + 127, 0, 254).astype(np.uint8)


def e4m3_to_f64(byte: np.ndarray) -> np.ndarray:
    b = np.asarray(byte).astype(np.int64)
    sign = np.where((b >> 7) & 1, -1.0, 1.0)
    e = (b >> 3) & 0xF
    m = b & 7
    v = np.where(e == 0, m * 2.0 ** -9, (1.0 + m / 8.0) * np.ldexp(1.0, e - 7))
    v = np.where((e == 15) & (m == 7), np.nan, v)
    return sign * v


def e4m3_from_f64(x: np.ndarray) -> np.ndarray:
    """Saturating RTNE fp64 -> e4m3fn byte (via ml_dtypes for fidelity)."""
    import ml_dtypes
    x = np.asarray(x, dtype=np.float64)
    clamped = np.clip(x, -448.0, 448.0)
    clamped = np.where(np.isnan(x), np.nan, clamped)
    return np.clip(clamped, -448, 448).astype(ml_dtypes.float8_e4m3fn).view(np.uint8)


def pack_mask(mask_bits: np.ndarray) -> np.ndarray:
    """bool [..., K] -> uint8 [..., K/8], bit i of byte j = element 8j+i."""
    m = np.asarray(mask_bits, dtype=np.uint8)
    g = m.reshape(*m.shape[:-1], -1, 8)
    return (g << np.arange(8, dtype=np.uint8)).sum(-1).astype(np.uint8)


def unpack_mask(mask: np.ndarray) -> np.ndarray:
    m = np.asarray(mask).astype(np.uint8)
    out = np.zeros((*m.shape[:-1], m.shape[-1] * 8), dtype=bool)
    for i in range(8):
        out[..., i::8] = (m >> i) & 1
    return out


# ---------------------------------------------------------------------------
# Golden fused quantizers
# ---------------------------------------------------------------------------

def quantize_mx(x: np.ndarray, h: np.ndarray, rot_size: int, method: str = "quest"):
    """fp64 golden fused rotate+quantize, MX (group 32, e8m0 scales).

    Port of mxfp4_test.py:135-184.  ``x``/``h`` are cast to fp64.
    Returns dict with keys: dq, e2m1 (packed u8), e8m0 (bytes u8), mask
    (packed u8), mask_bits (bool).
    """
    x = np.asarray(x, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64).reshape(rot_size, rot_size)
    quest = method == "quest"
    xh = (x.reshape(*x.shape[:-1], -1, rot_size) @ h).reshape(x.shape)

    g = xh.reshape(*xh.shape[:-1], -1, 32)
    if quest:
        scales_ = g.std(axis=-1) * (2.92247856 / 6.0) + 1e-8
    else:
        scales_ = np.abs(g).max(axis=-1) + 1e-8

    e8m0 = e8m0_from_pow2_f64(np.exp2(np.floor(np.log2(scales_))))
    scales = e8m0_to_f64(e8m0)

    xs = (g / scales[..., None]).reshape(xh.shape)
    if not quest:
        xs = xs * 3.0

    mask_bits = np.abs(xs) < 6.0
    mask = pack_mask(mask_bits)

    vals, packed = rtne_fp4(xs)
    alpha = 1.0 if quest else 3.0
    dq = dq_fp4(packed, e8m0, 32, alpha)
    return dict(dq=dq, e2m1=packed, e8m0=e8m0, mask=mask, mask_bits=mask_bits,
                values=vals, alpha=alpha)


def quantize_nv(x: np.ndarray, h: np.ndarray, rot_size: int,
                global_scale: float, method: str = "abs_max"):
    """fp64 golden NVFP4 quantize (group 16, e4m3 scales).

    abs_max follows nvfp4_test.py:132-170 (global_scale folded at
    dequant); quest follows the device epilogue (epilogue_quant.h:1621-49).
    Returns dict with dq, e2m1, e4m3 bytes.
    """
    x = np.asarray(x, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64).reshape(rot_size, rot_size)
    xh = (x.reshape(*x.shape[:-1], -1, rot_size) @ h).reshape(x.shape)
    g = xh.reshape(*xh.shape[:-1], -1, 16)

    if method == "abs_max":
        amax = np.abs(g).max(axis=-1)
        sf = e4m3_from_f64(global_scale * amax / 6.0)
        sfv = e4m3_to_f64(sf)
        with np.errstate(divide="ignore", invalid="ignore"):
            mul = np.where(sfv != 0, global_scale / sfv, 0.0)
        xs = (g * mul[..., None]).reshape(xh.shape)
        e4m3 = sf
    else:
        s = g.std(axis=-1) * (2.92247856 / 6.0) + 1e-8
        e4m3 = e4m3_from_f64(s)
        sv = e4m3_to_f64(e4m3)
        with np.errstate(divide="ignore", invalid="ignore"):
            mul = np.where(sv > 0, 1.0 / sv, 0.0)
        xs = (g * mul[..., None]).reshape(xh.shape)

    vals, packed = rtne_fp4(xs)
    scales = e4m3_to_f64(e4m3)
    dqg = unpack_fp4(packed).reshape(*xh.shape[:-1], -1, 16) * scales[..., None]
    dq = dqg.reshape(xh.shape)
    return dict(dq=dq, e2m1=packed, e4m3=e4m3, values=vals)


def backward_quantize(x: np.ndarray, h: np.ndarray):
    """Golden abs-max backward quantizer (no +1e-8), quartet_test.py:155-173.

    Operates on the *last* axis of ``x`` (callers pass the transposed
    tensor).  Returns dict with dq, e2m1, e8m0.
    """
    x = np.asarray(x, dtype=np.float64)
    rot = np.asarray(h, dtype=np.float64)
    n = rot.shape[0]
    xh = (x.reshape(*x.shape[:-1], -1, n) @ rot).reshape(x.shape)
    g = xh.reshape(*xh.shape[:-1], -1, 32)
    amax = np.abs(g).max(axis=-1)
    with np.errstate(divide="ignore"):
        p2 = np.exp2(np.floor(np.log2(np.where(amax > 0, amax, 2.0 ** -127))))
    e8m0 = e8m0_from_pow2_f64(np.where(amax > 0, p2, 2.0 ** -127))
    scales = e8m0_to_f64(e8m0)
    xs = (g / scales[..., None]).reshape(xh.shape) * 3.0
    vals, packed = rtne_fp4(xs)
    dq = dq_fp4(packed, e8m0, 32, alpha=3.0)
    return dict(dq=dq, e2m1=packed, e8m0=e8m0)


def bf16_square_double_mxfp8(x: np.ndarray):
    """Golden 32x32-tile double quantization to MXFP8 (quartet_test.py:284-310).

    ``x`` is [M, N] (already padded to M % 128 == 0 by the caller).
    Returns (fp8 bytes [M,N], row_scales [M, N/32], col_scales [N, M/32]).
    """
    x = np.asarray(x, dtype=np.float64)
    m, n = x.shape
    t = x.reshape(m // 32, 32, n // 32, 32)
    amax = np.abs(t).max(axis=(1, 3))
    with np.errstate(divide="ignore"):
        ebyte = np.where(amax > 0,
                         np.floor(np.log2(np.where(amax > 0, amax, 1.0))) - 7 + 127,
                         127).astype(np.uint8)
    sc = e8m0_to_f64(ebyte)
    import ml_dtypes
    # The reference divides in bf16 then casts to e4m3 (quartet_test.py:305-307).
    xb = x.astype(ml_dtypes.bfloat16)
    q = (xb.astype(np.float64).reshape(m // 32, 32, n // 32, 32)
         / sc[:, None, :, None])
    q8 = np.clip(q, -448, 448).astype(ml_dtypes.bfloat16).astype(ml_dtypes.float8_e4m3fn)
    fp8 = q8.view(np.uint8).reshape(m, n)
    row_scales = np.repeat(ebyte, 32, axis=0)
    col_scales = np.repeat(ebyte.T, 32, axis=0)
    return fp8, row_scales, col_scales


def to_blocked_swizzled(scales: np.ndarray) -> np.ndarray:
    """The cuBLAS/Blackwell 128x4 block swizzle (reference utils.py:160-193).

    Provided for interop/export only — the TPU layout is plain row-major.
    Input [H, W] (H % 128 == 0, W % 4 == 0); returns the flattened
    swizzled layout.
    """
    rows, cols = scales.shape
    nr, nc = rows // 128, cols // 4
    blocks = scales.reshape(nr, 128, nc, 4).transpose(0, 2, 1, 3)
    return blocks.reshape(-1, 4, 32, 4).transpose(0, 2, 1, 3).reshape(-1)
