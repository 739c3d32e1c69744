"""JAX version compatibility shims for the parallel layer.

``jax.shard_map`` (v0.8+) renamed ``check_rep`` to ``check_vma`` and the
old ``jax.experimental.shard_map`` emits a DeprecationWarning.  This
module exposes a single ``shard_map`` that accepts ``check_rep`` on any
JAX version.
"""
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older JAX
    from jax.experimental.shard_map import shard_map as _shard_map

_PARAMS = inspect.signature(_shard_map).parameters
_CHECK_KW = "check_vma" if "check_vma" in _PARAMS else "check_rep"


def shard_map(f=None, **kw):
    if "check_rep" in kw and _CHECK_KW != "check_rep":
        kw[_CHECK_KW] = kw.pop("check_rep")
    if f is None:
        return lambda g: _shard_map(g, **kw)
    return _shard_map(f, **kw)
