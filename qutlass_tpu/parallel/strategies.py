"""Parallelism strategies over a device mesh, built on the quantized ops.

The reference library is single-GPU; its multi-GPU story is "the host
framework shards the model and calls the kernels per shard"
(SURVEY.md §2.10).  This module supplies those host-framework patterns
TPU-natively — shard_map + XLA collectives over ICI — so a user of the
reference's vLLM/Transformers integrations finds the same layouts here:

  * tensor parallel      — column/row-parallel quantized linears (psum)
  * sequence parallel    — Megatron-SP: all_gather activations into the
                           TP region, psum_scatter back to sequence shards
  * pipeline parallel    — GPipe microbatch schedule with ppermute
                           between stage devices
  * expert parallel      — capacity-based top-1 MoE with all_to_all
                           token exchange, quantized expert MLPs

Everything is differentiable (collectives transpose correctly), so the
same code paths serve QAT training in the dryrun/training harnesses.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..nn import quartet_linear


# ---------------------------------------------------------------------------
# tensor + sequence parallel
# ---------------------------------------------------------------------------

def tp_mlp(x, w1, w2, h, axis: str, method: str = "quest"):
    """Megatron tensor-parallel quantized MLP (inside shard_map).

    w1 [inter/tp, d] column-parallel, w2 [d, inter/tp] row-parallel;
    one psum on the way out.
    """
    h1 = quartet_linear(x, w1, h, method)
    h1 = jax.nn.relu(h1.astype(jnp.float32)).astype(jnp.bfloat16)
    yp = quartet_linear(h1, w2, h, method)
    return lax.psum(yp.astype(jnp.float32), axis).astype(jnp.bfloat16)


def sp_mlp(x_seq, w1, w2, h, axis: str, method: str = "quest"):
    """Sequence-parallel quantized MLP (inside shard_map).

    ``x_seq`` [s/tp, d] is sequence-sharded along ``axis``.  all_gather
    into the TP region, column/row-parallel quantized GEMMs, then
    psum_scatter back to sequence shards — the Megatron-SP schedule
    (all_gather + reduce_scatter replace the plain psum, halving
    activation memory between the blocks).
    """
    x = lax.all_gather(x_seq, axis, tiled=True)          # [s, d]
    h1 = quartet_linear(x, w1, h, method)                # [s, inter/tp]
    h1 = jax.nn.relu(h1.astype(jnp.float32)).astype(jnp.bfloat16)
    yp = quartet_linear(h1, w2, h, method)               # partial [s, d]
    return lax.psum_scatter(yp.astype(jnp.float32), axis,
                            scatter_dimension=0, tiled=True
                            ).astype(jnp.bfloat16)       # [s/tp, d]


# ---------------------------------------------------------------------------
# pipeline parallel (GPipe schedule)
# ---------------------------------------------------------------------------

def gpipe(stage_fn: Callable, params_local, mbs: jax.Array, *, axis: str,
          n_stages: int):
    """GPipe microbatch pipeline (inside shard_map over ``axis``).

    ``params_local``: this stage's parameters (already axis-sharded).
    ``mbs``: [n_mb, mb, ...] microbatches (replicated; stage 0 reads
    them).  Each scan step applies the local stage and ppermutes the
    activation to the next stage device; the last stage's outputs are
    collected and broadcast with a psum.  Differentiable — ppermute
    transposes to the reverse shift, giving the 1F1B-equivalent reverse
    schedule under jax.grad for free.
    """
    n_mb = mbs.shape[0]
    idx = lax.axis_index(axis)
    n_steps = n_mb + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    def step(carry, t):
        recv, results = carry
        feed = lax.dynamic_index_in_dim(mbs, jnp.clip(t, 0, n_mb - 1), 0,
                                        keepdims=False)
        inp = jnp.where(idx == 0, feed.astype(recv.dtype), recv)
        out = stage_fn(params_local, inp)
        slot = t - (n_stages - 1)
        valid = (idx == n_stages - 1) & (slot >= 0)
        upd = lax.dynamic_update_index_in_dim(
            results, out, jnp.clip(slot, 0, n_mb - 1), 0)
        results = jnp.where(valid, upd, results)
        recv = lax.ppermute(out, axis, perm)
        return (recv, results), None

    zero = jnp.zeros(mbs.shape[1:], jnp.bfloat16)
    results0 = jnp.zeros(mbs.shape, jnp.bfloat16)
    (_, results), _ = lax.scan(step, (zero, results0),
                               jnp.arange(n_steps))
    # everyone gets the last stage's outputs (all other shards hold 0)
    return lax.psum(results.astype(jnp.float32), axis).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# expert parallel (capacity-based top-1 MoE)
# ---------------------------------------------------------------------------

def moe_dispatch_top1(gate_logits: jax.Array, capacity: int):
    """Top-1 router -> (dispatch [m, E, cap] one-hot, combine weights).

    Capacity-based Switch routing: position within an expert's buffer is
    the cumulative count of earlier tokens routed to it; overflowing
    tokens are dropped (dispatch row of zeros).
    """
    m, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(probs, axis=-1)                     # [m]
    onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)   # [m, E]
    pos = (jnp.cumsum(onehot, axis=0) - onehot) * onehot    # rank per expert
    pos = jnp.sum(pos, axis=-1).astype(jnp.int32)           # [m]
    keep = pos < capacity
    dispatch = (onehot[:, :, None]
                * jax.nn.one_hot(pos, capacity, dtype=jnp.float32)[:, None, :]
                * keep[:, None, None].astype(jnp.float32))  # [m, E, cap]
    gate = jnp.max(probs * onehot, axis=-1) * keep          # [m]
    return dispatch, gate


def moe_mlp_ep(x, router_w, w1_stack, w2_stack, h, *, axis: str,
               n_experts: int, capacity: int, method: str = "quest"):
    """Expert-parallel quantized MoE block (inside shard_map over ``axis``).

    ``x`` [m, d] per-shard tokens; ``w1_stack``/``w2_stack``
    [E/ep, inter, d] / [E/ep, d, inter] local expert weights;
    ``router_w`` [d, E] replicated.  Tokens are dispatched to expert
    buffers, exchanged with all_to_all so each device holds its own
    experts' tokens from *all* shards, run through quantized expert
    MLPs, and returned by the reverse all_to_all.
    """
    ep = lax.psum(1, axis)
    e_local = n_experts // ep
    d = x.shape[-1]
    logits = x.astype(jnp.float32) @ router_w.astype(jnp.float32)
    dispatch, gate = moe_dispatch_top1(logits, capacity)    # [m, E, cap]

    # [ep, e_local, cap, d] expert buffers from this shard's tokens
    buf = jnp.einsum("mec,md->ecd", dispatch, x.astype(jnp.float32))
    buf = buf.reshape(ep, e_local, capacity, d)
    # exchange: shard p receives, for each of ITS experts, the buffers
    # built by every peer — recv[q, e, c] = buf_q[p, e, c]
    recv = lax.all_to_all(buf, axis, split_axis=0, concat_axis=0,
                          tiled=True)                       # [ep, e_local, cap, d]
    flat = recv.transpose(1, 0, 2, 3).reshape(
        e_local, ep * capacity, d).astype(jnp.bfloat16)

    outs = []
    for e in range(e_local):
        h1 = quartet_linear(flat[e], w1_stack[e], h, method)
        h1 = jax.nn.relu(h1.astype(jnp.float32)).astype(jnp.bfloat16)
        outs.append(quartet_linear(h1, w2_stack[e], h, method))
    out = jnp.stack(outs).astype(jnp.float32)               # [e_local, ep*cap, d]

    # reverse exchange, restoring [E, cap, d] in this shard's token order
    out4 = out.reshape(e_local, ep, capacity, d).transpose(1, 0, 2, 3)
    back = lax.all_to_all(out4, axis, split_axis=0, concat_axis=0,
                          tiled=True)
    back = back.reshape(n_experts, capacity, d)
    y = jnp.einsum("mec,ecd->md", dispatch, back)
    return (y * gate[:, None]).astype(jnp.bfloat16)


# ---------------------------------------------------------------------------
# ZeRO-1 data parallelism (sharded optimizer state)
# ---------------------------------------------------------------------------

def zero_adam_init(params, axis: str):
    """Adam state for :func:`zero_adam_step`, sharded 1/dp per rank.

    Inside shard_map over ``axis``: each rank holds only its shard of
    the first/second moments (the ZeRO-1 memory property — optimizer
    state is the dominant training-state term at 2x fp32 per param).
    """
    n = lax.psum(1, axis)

    def per(p):
        k = -(-p.size // n)
        return jnp.zeros((k,), jnp.float32)

    return {"m": jax.tree.map(per, params),
            "v": jax.tree.map(per, params),
            "t": jnp.zeros((), jnp.int32)}


def zero_adam_step(params, grads, state, *, axis: str, lr: float,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One ZeRO-1 Adam step inside shard_map over the dp ``axis``.

    ``params`` replicated per rank, ``grads`` the rank's local
    microbatch gradients, ``state`` from :func:`zero_adam_init`.  The
    classic allreduce decomposes into its two halves around the
    optimizer: ``psum_scatter`` averages the gradients AND hands each
    rank only its 1/dp shard; the Adam moments and the fp32 update run
    on that shard alone; ``all_gather`` rebuilds the full (replicated)
    parameters.  Same arithmetic per element as replicated Adam on the
    psum-mean gradient — only the optimizer memory changes (1/dp).

    Returns ``(new_params, new_state)``; params keep their dtype (fp32
    master-update then cast, matching the dryrun training step).
    """
    n = lax.psum(1, axis)
    r = lax.axis_index(axis)
    t = state["t"] + 1
    bc1 = 1.0 - b1 ** t.astype(jnp.float32)
    bc2 = 1.0 - b2 ** t.astype(jnp.float32)

    def per(p, g, m, v):
        k = m.shape[0]
        gflat = jnp.pad(g.reshape(-1).astype(jnp.float32),
                        (0, k * n - g.size))
        gs = lax.psum_scatter(gflat, axis, scatter_dimension=0,
                              tiled=True) / n
        m2 = b1 * m + (1.0 - b1) * gs
        v2 = b2 * v + (1.0 - b2) * gs * gs
        upd = lr * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        pflat = jnp.pad(p.reshape(-1).astype(jnp.float32),
                        (0, k * n - p.size))
        ps = lax.dynamic_slice_in_dim(pflat, r * k, k) - upd
        pnew = lax.all_gather(ps, axis, tiled=True)[: p.size]
        return pnew.reshape(p.shape).astype(p.dtype), m2, v2

    out = jax.tree.map(per, params, grads, state["m"], state["v"])
    new_params = jax.tree.map(lambda o: o[0], out,
                              is_leaf=lambda o: isinstance(o, tuple))
    new_m = jax.tree.map(lambda o: o[1], out,
                         is_leaf=lambda o: isinstance(o, tuple))
    new_v = jax.tree.map(lambda o: o[2], out,
                         is_leaf=lambda o: isinstance(o, tuple))
    return new_params, {"m": new_m, "v": new_v, "t": t}
