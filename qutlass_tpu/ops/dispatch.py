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
        return jax.default_backend() not in ("cpu", "gpu")
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
