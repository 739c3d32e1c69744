"""ctypes bindings for the native host library (csrc/qutlass_host.cpp).

The native layer provides the fp64 golden quantizers, scalar codecs and
the GPU-interop scale swizzle at C speed.  It auto-builds on first use
(``make -C csrc``) and degrades gracefully: :func:`available` reports
whether the shared object could be loaded.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_SO = os.path.join(_CSRC, "libqutlass_host.so")


@lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.qutlass_quantize_mx_golden.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, u8p, u8p, ctypes.c_void_p]
    lib.qutlass_dequantize_mx.argtypes = [
        u8p, u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float, f32p]
    lib.qutlass_to_blocked_swizzled.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, u8p]
    for name in ("e2m1_encode", "e4m3_encode", "e8m0_encode"):
        fn = getattr(lib, f"qutlass_{name}")
        fn.argtypes = [ctypes.c_double]
        fn.restype = ctypes.c_uint8
    for name in ("e2m1_decode", "e4m3_decode", "e8m0_decode"):
        fn = getattr(lib, f"qutlass_{name}")
        fn.argtypes = [ctypes.c_uint8]
        fn.restype = ctypes.c_double
    lib.qutlass_bf16_round.argtypes = [ctypes.c_double]
    lib.qutlass_bf16_round.restype = ctypes.c_double
    lib.qutlass_host_abi_version.restype = ctypes.c_int
    return lib


def available() -> bool:
    return _lib() is not None


def quantize_mx_golden(x: np.ndarray, h: np.ndarray, method: str = "quest",
                       return_mask: bool = False):
    """Native fp64 golden MX quantizer.  x: [rows, K] float32-castable."""
    lib = _lib()
    assert lib is not None, "native host library unavailable"
    x = np.ascontiguousarray(x, np.float32)
    h = np.ascontiguousarray(h, np.float32)
    rows, k = x.shape
    rot = h.shape[0]
    packed = np.zeros((rows, k // 2), np.uint8)
    scales = np.zeros((rows, k // 32), np.uint8)
    mask = np.zeros((rows, k // 8), np.uint8) if return_mask else None
    lib.qutlass_quantize_mx_golden(
        x, h, rows, k, rot, 0 if method == "quest" else 1, packed, scales,
        mask.ctypes.data_as(ctypes.c_void_p) if return_mask else None)
    return (packed, scales, mask) if return_mask else (packed, scales)


def dequantize_mx(packed: np.ndarray, scales: np.ndarray,
                  alpha: float = 1.0) -> np.ndarray:
    lib = _lib()
    assert lib is not None
    rows = packed.shape[0]
    k = packed.shape[1] * 2
    out = np.zeros((rows, k), np.float32)
    lib.qutlass_dequantize_mx(np.ascontiguousarray(packed, np.uint8),
                              np.ascontiguousarray(scales, np.uint8),
                              rows, k, 1.0 / alpha, out)
    return out


def to_blocked_swizzled(scales: np.ndarray) -> np.ndarray:
    """cuBLAS 128x4 swizzle for GPU export (rows%128==0, cols%4==0)."""
    lib = _lib()
    assert lib is not None
    rows, cols = scales.shape
    out = np.zeros(rows * cols, np.uint8)
    lib.qutlass_to_blocked_swizzled(
        np.ascontiguousarray(scales, np.uint8), rows, cols, out)
    return out


def e2m1_encode(x: float) -> int:
    return _lib().qutlass_e2m1_encode(float(x))


def e4m3_encode(x: float) -> int:
    return _lib().qutlass_e4m3_encode(float(x))


def e8m0_encode(x: float) -> int:
    return _lib().qutlass_e8m0_encode(float(x))
