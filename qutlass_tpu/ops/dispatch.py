"""Backend dispatch: Pallas TPU kernels vs XLA emulation.

The reference selects between CUTLASS/FlashInfer backends and
compile-time arch variants (bindings.cpp:317-325, __init__.py:40-76).
Here the split is runtime: compiled Pallas kernels on TPU for supported
shapes, the portable XLA emulation everywhere else.  Override with
``QUTLASS_TPU_BACKEND=pallas|emulation|auto`` or :func:`set_backend`.
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax

_BACKEND = os.environ.get("QUTLASS_TPU_BACKEND", "auto")

VALID_BACKENDS = ("auto", "pallas", "emulation")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in VALID_BACKENDS:
        raise ValueError(f"invalid backend {name!r}; use one of {VALID_BACKENDS}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


@lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def use_pallas(shape_ok: bool = True) -> bool:
    """Decide whether the Pallas path should handle this call."""
    if _BACKEND == "emulation":
        return False
    if _BACKEND == "pallas":
        return True
    return on_tpu() and shape_ok


@lru_cache(maxsize=1)
def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:
        return "cpu"


# --------------------------------------------------------------- debugging
# Silent emulation fallbacks are a perf cliff (an M=250 batch quietly
# runs the XLA emulation graph at a fraction of Pallas speed).  With
# QUTLASS_TPU_DEBUG=1 every on-TPU fallback emits a warning naming the
# op, the offending shape, and the constraint; the counter is always on.

_DEBUG = os.environ.get("QUTLASS_TPU_DEBUG", "") not in ("", "0")
fallback_counts: dict = {}


def set_debug(enabled: bool) -> None:
    global _DEBUG
    _DEBUG = bool(enabled)


def note_fallback(op: str, shape, constraint: str) -> None:
    """Record (and under QUTLASS_TPU_DEBUG, warn about) an emulation
    fallback taken on the TPU backend for an unsupported shape."""
    fallback_counts[op] = fallback_counts.get(op, 0) + 1
    if _DEBUG and (on_tpu() or _BACKEND == "pallas"):
        import warnings
        warnings.warn(
            f"qutlass_tpu: {op}{tuple(shape)} falls back to XLA emulation "
            f"(needs {constraint}) — expect reduced throughput",
            stacklevel=3)
