"""Serialization and cross-stack interop for quantized tensors.

The reference leaves persistence to the host framework (quantized
tensors are plain torch tensors, SURVEY.md §5); here quantized params
are plain uint8/bf16 JAX arrays, so the same applies — these helpers
add a stable on-disk container plus export to the reference's CUDA
layout for interchange with GPU runtimes.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

from .utils import round_up, to_blocked_swizzled

_FORMAT_VERSION = 1


def save_quantized(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Save a pytree of (uint8/bf16/f32) arrays to an .npz container.

    npz only knows stock numpy dtypes, so ml_dtypes leaves (bfloat16,
    fp8 views) are stored as same-width unsigned bytes with the true
    dtype name recorded in the metadata and restored on load.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays, dtypes = {}, []
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        dtypes.append(a.dtype.name)
        if a.dtype.kind not in "uifb":      # ml_dtypes (bf16/fp8/...)
            a = a.view({2: np.uint16, 4: np.uint32}.get(a.dtype.itemsize,
                                                        np.uint8))
        arrays[f"leaf_{i}"] = a
    meta = {"format_version": _FORMAT_VERSION,
            "treedef": str(treedef),
            "num_leaves": len(leaves),
            "dtypes": dtypes,
            "user": metadata or {}}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_quantized(path: str, like: Any):
    """Load arrays saved by :func:`save_quantized` into the structure of
    ``like`` (same treedef)."""
    import ml_dtypes

    with np.load(path) as data:
        meta = json.loads(bytes(data["__meta__"]).decode())
        leaves = []
        for i in range(meta["num_leaves"]):
            a = data[f"leaf_{i}"]
            name = meta.get("dtypes", [None] * (i + 1))[i]
            if name is not None and a.dtype.name != name:
                a = a.view(np.dtype(getattr(ml_dtypes, name, name)))
            leaves.append(a)
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def export_scales_for_cuda(scale_bytes, k: int, gs: int = 32):
    """Convert row-major scale bytes to the cuBLAS/Blackwell swizzled
    layout consumed by the reference GEMMs (utils.py:160-193 there).

    Accepts exact [rows, K/gs] or the padded buffer; returns the
    flattened swizzled uint8 layout (padded to 128x4 blocks).
    """
    import jax.numpy as jnp
    sb = jnp.asarray(scale_bytes)
    rows, cols = sb.shape
    pr, pc = round_up(rows, 128), round_up(cols, 4)
    if (rows, cols) != (pr, pc):
        sb = jnp.zeros((pr, pc), jnp.uint8).at[:rows, :cols].set(sb)
    return to_blocked_swizzled(sb)


def export_packed_for_cuda(packed):
    """The packed e2m1 nibble layout already matches the reference
    (element 2i in the low nibble) — returned as-is for clarity."""
    return packed
