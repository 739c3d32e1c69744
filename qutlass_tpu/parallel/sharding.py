"""Sharding rules for the quantized ops over a device mesh.

The reference library is single-GPU and shard-*transparent* — multi-GPU
use happens in host frameworks which shard models and call the kernels
per shard (SURVEY.md §2.10).  Here we make that transparency explicit
for pjit/shard_map:

  * quantization groups live entirely along K, so row (token/M)
    sharding is embarrassingly parallel;
  * K-sharding is legal when ``K_local % rot == 0`` (groups never cross
    shards); the GEMM then needs a ``psum`` over the contraction axis;
  * scale tensors shard exactly like their data: [M, K/gs] follows
    [M, K] with the column dim divided by gs.

``shard_quantized_linear`` wires a tensor-parallel (column-sharded
weight) + data-parallel quantized linear with XLA collectives over ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from qutlass_tpu.parallel.compat import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import qutlass_tpu as q


def make_mesh(axes: dict[str, int] | None = None, devices=None) -> Mesh:
    """Create a device mesh, e.g. make_mesh({'dp': 2, 'tp': 4})."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = {"dp": 1, "tp": len(devices)}
    names = tuple(axes)
    shape = tuple(axes.values())
    arr = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(arr, names)


def with_row_sharding(mesh: Mesh, axis: str = "dp"):
    """NamedShardings for (x, packed, scales) row-sharded along M."""
    return (NamedSharding(mesh, P(axis, None)),
            NamedSharding(mesh, P(axis, None)),
            NamedSharding(mesh, P(axis, None)))


def quantized_op_sharding_rules():
    """Documentation of legal PartitionSpecs per op (M=rows, K=contraction).

    Returns {op_name: (input_specs, output_specs)} with 'm'/'n'/'k'
    placeholders for mesh axes.
    """
    return {
        "fusedQuantizeMx": ((P("m", None), P(None, None)),
                            (P("m", None), P("m", None))),
        "matmul_*_tn": ((P("m", "k"), P("n", "k"), P("m", "k"), P("n", "k")),
                        (P("m", "n"),)),
        "backward_*": ((P(None, None),), (P(None, None),)),
    }


def shard_quantized_linear(mesh: Mesh, w: jax.Array, h: jax.Array, *,
                           dp_axis: str = "dp", tp_axis: str = "tp",
                           method: str = "quest"):
    """Build a data+tensor-parallel MXFP4 W4A4 linear over ``mesh``.

    The weight [N, K] is column-parallel (N sharded over ``tp_axis``);
    activations are row-sharded over ``dp_axis``.  Each shard quantizes
    and multiplies locally — no collective is needed in the forward
    (output stays N-sharded), matching Megatron column-parallel layout.
    Returns ``apply(x) -> y`` with y sharded (dp, tp).
    """
    n, k = w.shape
    tp = mesh.shape[tp_axis]
    assert n % tp == 0, (n, tp)

    wq, ws = q.fusedQuantizeMx(w, h, method=method)
    ws = ws[:n, : k // 32]

    w_spec = NamedSharding(mesh, P(tp_axis, None))
    wq = jax.device_put(wq, w_spec)
    ws = jax.device_put(ws, w_spec)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(dp_axis, None), P(tp_axis, None), P(tp_axis, None)),
             out_specs=P(dp_axis, tp_axis), check_rep=False)
    def _apply(x_blk, wq_blk, ws_blk):
        m = x_blk.shape[0]
        xq, xs = q.fusedQuantizeMx(x_blk, h, method=method)
        return q.matmul_mxf4_bf16_tn(xq, wq_blk, xs[:m, : k // 32], ws_blk,
                                     jnp.ones((1,), jnp.float32))

    def apply(x):
        return _apply(x, wq, ws)

    return apply
