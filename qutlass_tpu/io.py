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
    ``like`` (same treedef).

    Compatibility note: abs_max MX weight dicts gained an ``am`` marker
    leaf (the weight-side 1/3 dequant factor now composes from the
    stored dict, not the runtime method).  Trees saved with abs_max
    weights BEFORE that change have fewer leaves than a
    freshly-quantized ``like`` and fail the treedef match here —
    re-quantize and re-save them rather than forcing a structure-
    matching ``like`` built with quest (which would silently mis-scale
    by 3x per operand under a runtime method of abs_max)."""
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


# ---------------------------------------------------------------------------
# Pre-quantized checkpoint interop (reference / vLLM / FP-Quant layout)
#
# The reference ecosystem stores quantized linear weights row-major:
# packed e2m1 u8 [N, K/2] (element 2i in the low nibble — the operand
# layout of reference __init__.py:34-131) with row-major scale bytes
# [N, K/gs] (e8m0 for MX, e4m3 for NV with a per-tensor fp32 global
# scale — the vLLM "nvfp4" two-level scheme, epilogue_quant.h:1650-1693).
# These importers convert one such tensor into the stored evaluator
# dict that models/transformer.py `_linear` consumes, so pre-quantized
# GPU checkpoints serve on TPU unchanged.  Checkpoints quantized
# WITHOUT a rotation should be served with h = identity_matrix(gs)
# (qutlass_tpu.identity_matrix); FP-Quant-style rotated checkpoints use
# the matching Hadamard.
# ---------------------------------------------------------------------------


def _rowmajor_to_kmajor(packed, scale_bytes, gs: int):
    """(packed u8 [N, K/2], scales u8 [N, K/gs] — also accepts the
    reference's padded 2-D buffer or its ``to_blocked`` flattening) ->
    (wqt u8 [K/2, N], wst u8 [K/gs, N])."""
    import jax.numpy as jnp

    from . import _norm_scales
    from .ops.int8path import _unpack

    packed = jnp.asarray(packed)
    if packed.dtype != jnp.uint8:
        raise TypeError(
            f"weight_packed must be uint8 e2m1 nibbles, got {packed.dtype} "
            "(int32-packed checkpoints — GPTQ/AWQ/int4 pack-quantized — "
            "are a different scheme, not supported)")
    n, k2 = packed.shape
    k = 2 * k2
    sb = _norm_scales(scale_bytes, n, k // gs)
    # [N, K] with element 2i from the low nibble, then K-major pairs
    c = _unpack(packed).T                                # [K, N]
    wqt = (c[0::2] | (c[1::2] << 4)).astype(jnp.uint8)   # [K/2, N]
    return wqt, sb.T


def import_mxfp4_weight(packed, scale_bytes, *, weight_format: str = "int8"):
    """Row-major MXFP4 weight (reference layout) -> stored evaluator
    dict for ``_linear`` ({wi8, wsb} when the int8 mapping is exact —
    checked host-side like quantize_model_weights — else {wqt, wst};
    ``weight_format`` as in models.quantize_model_weights)."""
    from .ops import int8path as I8

    wqt, wst = _rowmajor_to_kmajor(packed, scale_bytes, 32)
    if weight_format in ("int8", "both"):
        wi8, wsb, dmax = I8.prepare_weight_int8(wqt, wst)
        if int(dmax) <= 3:
            d = {"wi8": wi8, "wsb": wsb}
            if weight_format == "both":
                d.update(wqt=wqt, wst=wst)
            return d
    return {"wqt": wqt, "wst": wst}


def import_nvfp4_weight(packed, scale_bytes, global_scale, *,
                        weight_format: str = "int8", input_scale=None):
    """Row-major NVFP4 weight (vLLM two-level scheme: e4m3 group scales
    [N, K/16] + per-tensor fp32 global scale) -> stored evaluator dict
    ({nvi8, nvsb, gs} or {wqt, wst, gs}).

    ``input_scale`` (optional): the checkpoint's static ACTIVATION
    scale (modelopt/compressed-tensors ``input_scale``, the reciprocal
    of the activation global scale as vLLM consumes it) — stored as
    ``gsx = 1/input_scale`` so ``_linear`` skips the per-call
    rotated-amax pass (see models.transformer.calibrate_nv_gsx).
    """
    import jax.numpy as jnp

    from .ops import int8path as I8

    wqt, wst = _rowmajor_to_kmajor(packed, scale_bytes, 16)
    gs = jnp.asarray(global_scale, jnp.float32).reshape(())
    if weight_format in ("int8", "both"):
        nvi8, nvsb = I8.prepare_weight_nv_int8(wqt, wst)
        d = {"nvi8": nvi8, "nvsb": nvsb, "gs": gs}
        if weight_format == "both":
            d.update(wqt=wqt, wst=wst)
    else:
        d = {"wqt": wqt, "wst": wst, "gs": gs}
    if input_scale is not None:
        d["gsx"] = 1.0 / jnp.asarray(input_scale, jnp.float32).reshape(())
    return d


def export_quantized_weight(stored):
    """Stored evaluator dict -> reference row-major layout.

    Returns (packed u8 [N, K/2], scales u8 [N, K/gs]) for MX dicts and
    (packed, scales, global_scale f32) for NV dicts.  Requires the fp4
    bytes (weight_format "fp4" or "both"); int8-only dicts absorbed the
    group scales into the operand and cannot reproduce the original
    codes — re-import or re-quantize with weight_format="both" to
    export.  abs_max MX dicts ("am" marker) are rejected: their codes
    are 3x-scaled (dequant = code * scale / 3) and the on-disk
    convention is plain ``value = code * scale`` — 1/3 is neither on
    the e2m1 grid nor a power of two, so no bitwise re-expression
    exists; re-quantize with method="quest" to export."""
    import jax.numpy as jnp

    if "am" in stored:
        raise ValueError(
            "export_quantized_weight: abs_max-quantized MX weights store "
            "3x-scaled codes (dequant = code * scale / 3); the reference "
            "row-major on-disk layout dequantizes as code * scale and "
            "cannot represent them. Re-quantize with method='quest' to "
            "export.")
    if "wqt" not in stored:
        raise ValueError(
            "export_quantized_weight needs the packed fp4 bytes (wqt/wst); "
            "this dict stores only the int8 evaluator operand "
            f"(keys {sorted(stored)}). Quantize with weight_format='fp4' "
            "or 'both' to export.")
    from .ops.int8path import _unpack_rows

    wqt, wst = jnp.asarray(stored["wqt"]), jnp.asarray(stored["wst"])
    codes = _unpack_rows(wqt).T                                # [N, K]
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(jnp.uint8)
    scales = wst.T
    if "gs" in stored:
        return packed, scales, jnp.asarray(stored["gs"], jnp.float32)
    return packed, scales
