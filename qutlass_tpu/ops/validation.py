"""Argument validation for the public ops.

The reference guards its kernels with a C++ validation layer
(qutlass/csrc/bindings_utils.h:67-136: dtype, contiguity, device and
shape checks raising descriptive errors).  This is the JAX analogue —
pure-Python checks raising ValueError/TypeError before tracing, so user
errors surface with messages instead of kernel shape failures.
"""
from __future__ import annotations

import jax.numpy as jnp


def check_bf16(name: str, x) -> None:
    if x.dtype != jnp.bfloat16:
        raise TypeError(f"{name} must be bfloat16, got {x.dtype}")


def check_bytes(name: str, x) -> None:
    if x.dtype not in (jnp.uint8, jnp.dtype("float8_e8m0fnu"),
                       jnp.dtype("float8_e4m3fn"), jnp.int32):
        raise TypeError(
            f"{name} must be a uint8 byte tensor (or an ml_dtypes fp8 "
            f"view), got {x.dtype}")


def check_rotation(h, k: int) -> int:
    rot = h.shape[-1]
    if h.ndim != 2 or h.shape[0] != rot:
        raise ValueError(f"rotation must be square, got {h.shape}")
    if rot not in (16, 32, 64, 128):
        raise ValueError(f"rotation size must be in (16, 32, 64, 128), "
                         f"got {rot}")
    if k % rot != 0:
        raise ValueError(f"last dim {k} must be divisible by the rotation "
                         f"size {rot}")
    return rot


def check_group_dim(name: str, k: int, gs: int) -> None:
    if k % gs != 0:
        raise ValueError(f"{name}: K={k} must be divisible by the "
                         f"quantization group size {gs}")
    if k < gs:
        raise ValueError(f"{name}: K={k} must be >= group size {gs}")


def check_matmul_tn(a, b, gs: int) -> tuple[int, int, int]:
    if a.ndim != 2 or b.ndim != 2:
        raise ValueError(f"operands must be 2-D, got {a.shape} / {b.shape}")
    if a.shape[1] != b.shape[1]:
        raise ValueError(
            f"TN operands must share packed K: {a.shape} vs {b.shape}")
    k = a.shape[1] * 2
    check_group_dim("matmul", k, gs)
    return a.shape[0], b.shape[0], k
