"""Flax Linen integration: drop-in quantized Dense layers.

The reference integrates via HF Transformers / vLLM layer replacement
(README.md:50-51, 66).  The JAX-ecosystem analogue is a Linen module
that can replace ``nn.Dense`` inside any Flax model, plus a tree-surgery
helper that swaps Dense kernels for quantized ones after init/restore.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
    _HAS_FLAX = True
except Exception:  # pragma: no cover
    _HAS_FLAX = False

import qutlass_tpu as q
from .linear import quartet_linear

if _HAS_FLAX:

    class QuartetDense(nn.Module):
        """W4A4 MXFP4 dense layer (Quartet QAT in training mode).

        Attributes:
          features: output dim N.
          rot_size: Hadamard rotation size (16/32/64/128).
          method: "quest" | "abs_max".
          train_quantized: if True the forward is the differentiable
            quartet path (QAT); else inference quantization.
        """
        features: int
        rot_size: int = 32
        method: str = "quest"
        train_quantized: bool = True
        kernel_init: Callable = nn.initializers.lecun_normal()

        @nn.compact
        def __call__(self, x):
            k = x.shape[-1]
            w = self.param("kernel", self.kernel_init, (self.features, k),
                           jnp.bfloat16)
            h = _hadamard_cached(self.rot_size)
            x2 = x.reshape(-1, k).astype(jnp.bfloat16)
            if self.train_quantized:
                y = quartet_linear(x2, w, h, self.method)
            else:
                wqt, wst = q.fusedQuantizeMx(w, h, method=self.method,
                                             layout="kmajor")
                y = q.fused_linear_mxf4(x2, wqt, wst, h, method=self.method)
            return y.reshape(*x.shape[:-1], self.features)


def _hadamard_cached(n: int) -> jnp.ndarray:
    from ..utils import hadamard_matrix
    return hadamard_matrix(n, jnp.bfloat16)


def swap_dense_kernels(params: Any, h: jnp.ndarray, method: str = "quest",
                       predicate=None):
    """Tree surgery: replace every 2-D 'kernel' leaf [K, N] with its
    quantized K-major representation {'wqt', 'wst'} (HF-style layer
    replacement for arbitrary Flax params).

    ``predicate(path, leaf)`` can opt specific kernels out.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def convert(path, leaf):
        name = str(path[-1]) if path else ""
        if (leaf.ndim == 2 and "kernel" in name
                and (predicate is None or predicate(path, leaf))):
            # flax stores kernels [K, N]; quantize the [N, K] transpose
            wqt, wst = q.fusedQuantizeMx(leaf.T.astype(jnp.bfloat16), h,
                                         method=method, layout="kmajor")
            return {"wqt": wqt, "wst": wst}
        return leaf

    leaves = [convert(p, l) for p, l in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
