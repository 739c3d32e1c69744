"""Mixture-of-Experts decoder family (Qwen3-MoE geometry) with MXFP4
W4A4 expert MLPs.

Extends the dense transformer (transformer.py) with top-k
capacity-based expert routing; every expert projection (gate/up/down)
and the attention projections run through the quantized linear path.
Under a mesh, expert weights shard over the 'ep' axis with
parallel.strategies.moe_mlp_ep; this single-device module is the
numerics reference for that path.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

import qutlass_tpu as q

from . import serving as _serving

from .transformer import (ModelConfig, _linear, _rms_norm, _rope,
                          init_params as _dense_init,
                          quantize_model_weights as _dense_quant,
                          quantize_weight)


@dataclasses.dataclass(frozen=True)
class MoeConfig(ModelConfig):
    n_experts: int = 64
    top_k: int = 4
    moe_intermediate: int = 768


QWEN3_MOE_30B_A3B = MoeConfig(
    vocab_size=151_936, hidden_size=2048, intermediate_size=6144,
    num_layers=48, num_heads=32, num_kv_heads=4, head_dim=128,
    n_experts=128, top_k=8, moe_intermediate=768)


def tiny_moe_config(**kw) -> MoeConfig:
    base = dict(vocab_size=512, hidden_size=256, intermediate_size=512,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=64,
                qk_norm=True, n_experts=4, top_k=2, moe_intermediate=256)
    base.update(kw)
    return MoeConfig(**base)


def init_params(cfg: MoeConfig, key: jax.Array, dtype=jnp.bfloat16):
    """Dense-init params with each layer's MLP replaced by an MoE block."""
    params = _dense_init(cfg, key, dtype)
    keys = jax.random.split(jax.random.fold_in(key, 17), cfg.num_layers)
    for i, layer in enumerate(params["layers"]):
        ks = jax.random.split(keys[i], 4)
        del layer["gate_proj"], layer["up_proj"], layer["down_proj"]
        e, d, mi = cfg.n_experts, cfg.hidden_size, cfg.moe_intermediate
        layer["router"] = (jax.random.normal(ks[0], (d, e), jnp.float32)
                           * d ** -0.5)
        layer["expert_gate"] = (jax.random.normal(ks[1], (e, mi, d), jnp.float32)
                                * d ** -0.5).astype(dtype)
        layer["expert_up"] = (jax.random.normal(ks[2], (e, mi, d), jnp.float32)
                              * d ** -0.5).astype(dtype)
        layer["expert_down"] = (jax.random.normal(ks[3], (e, d, mi), jnp.float32)
                                * mi ** -0.5).astype(dtype)
    return params


def quantize_model_weights(cfg: MoeConfig, params, h, method: str = "quest",
                           fmt: str = "mx", weight_format: str = "int8"):
    """Quantize attention projections and every expert weight to MXFP4
    or NVFP4.

    ``fmt`` / ``weight_format`` as in the dense model (transformer.py):
    "int8" stores the int8-MXU operand (MX: per-tensor exactness check
    with fp4 fallback; NV: bounded-rounding operand with a per-weight
    global scale), "fp4" the packed decode format, "both" both.
    """
    quant = functools.partial(quantize_weight, h=h, method=method, fmt=fmt,
                              weight_format=weight_format)
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            ql[name] = quant(layer[name])
        for name in ("expert_gate", "expert_up", "expert_down"):
            qs = [quant(layer[name][e]) for e in range(cfg.n_experts)]
            # expert stacks must be format-uniform (stack_experts /
            # EP sharding stack per-key): if any expert tripped the MX
            # int8-exactness fallback, demote its siblings to fp4 too
            if any(set(d) != set(qs[0]) for d in qs):
                qs = [d if "wi8" not in d else
                      quantize_weight(layer[name][e], h=h, method=method,
                                      fmt=fmt, weight_format="fp4")
                      for e, d in enumerate(qs)]
            ql[name] = qs
        out["layers"].append(ql)
    return out


def topk_dispatch(logits: jax.Array, top_k: int, capacity: int):
    """Top-k capacity router -> (dispatch [m, E, cap] f32, gates [m, E]).

    Iterated top-1 dispatch: slot positions are cumulative per expert
    across the k rounds (tokens overflowing an expert's capacity drop).
    Gate weights are the softmax probs of the chosen experts,
    renormalized over the k picks (Qwen3-MoE norm_topk_prob behavior).
    """
    m, e = logits.shape
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    remaining = probs
    counts = jnp.zeros((e,), jnp.int32)
    pieces, gates = [], jnp.zeros((m, e), jnp.float32)
    for _ in range(top_k):
        choice = jnp.argmax(remaining, axis=-1)               # [m]
        onehot = jax.nn.one_hot(choice, e, dtype=jnp.float32)
        pos = (jnp.cumsum(onehot, axis=0) - onehot) * onehot
        pos = jnp.sum(pos, axis=-1).astype(jnp.int32) + counts[choice]
        keep = (pos < capacity).astype(jnp.float32)
        pieces.append(onehot[:, :, None]
                      * jax.nn.one_hot(pos, capacity, dtype=jnp.float32)[:, None]
                      * keep[:, None, None])
        gates = gates + onehot * probs * keep[:, None]
        counts = counts + jnp.sum(onehot, axis=0).astype(jnp.int32)
        remaining = remaining * (1.0 - onehot)
    dispatch = sum(pieces)
    gates = gates / jnp.maximum(jnp.sum(gates, -1, keepdims=True), 1e-9)
    return dispatch, gates


def _moe_mlp(cfg: MoeConfig, layer, x2, h, method, quantized):
    """x2 [m, D] -> MoE MLP output [m, D] (single-device dense routing)."""
    m, d = x2.shape
    # per-expert occupancy can never exceed m (each token picks an
    # expert at most once), so clamping to m is lossless and keeps the
    # decode path (m = batch) from padding expert buffers to 32 rows
    cap = min(m, max(32, int(2 * cfg.top_k * m / cfg.n_experts)))
    logits = x2.astype(jnp.float32) @ jnp.asarray(layer["router"], jnp.float32)
    dispatch, gates = topk_dispatch(logits, cfg.top_k, cap)

    buf = jnp.einsum("mec,md->ecd", dispatch,
                     x2.astype(jnp.float32)).astype(jnp.bfloat16)
    outs = []
    for e in range(cfg.n_experts):
        ge = _linear(buf[e], layer["expert_gate"][e], h, method, quantized)
        up = _linear(buf[e], layer["expert_up"][e], h, method, quantized)
        act = (jax.nn.silu(ge.astype(jnp.float32))
               * up.astype(jnp.float32)).astype(jnp.bfloat16)
        outs.append(_linear(act, layer["expert_down"][e], h, method,
                            quantized))
    back = jnp.stack(outs).astype(jnp.float32)                # [E, cap, D]
    comb = jnp.einsum("mec,ecd->med", dispatch, back)         # [m, E, D]
    y = jnp.einsum("med,me->md", comb, gates)
    return y.astype(jnp.bfloat16)


def forward(cfg: MoeConfig, params, tokens, h=None, *, quantized=False,
            method: str = "quest"):
    """Prefill forward for the MoE family: [B, T] -> logits [B, T, V]
    (transformer.forward with the MoE MLP hook)."""
    from .transformer import forward as _tf_forward
    return _tf_forward(cfg, params, tokens, h, quantized=quantized,
                       method=method, mlp=_moe_mlp_block)


def _moe_mlp_block(cfg, layer, xin, h, method, quantized):
    """serving._block ``mlp`` hook: [B, T, D] -> [B, T, D]."""
    b, t, d = xin.shape
    y = _moe_mlp(cfg, layer, xin.reshape(b * t, d), h, method, quantized)
    return y.reshape(b, t, d)


def prefill(cfg: MoeConfig, params, tokens, h=None, *, max_len: int,
            quantized: bool = False, method: str = "quest"):
    """KV-cache prefill for the MoE family (see serving.prefill)."""
    return _serving.prefill(cfg, params, tokens, h, max_len=max_len,
                            quantized=quantized, method=method,
                            mlp=_moe_mlp_block)


def decode_step(cfg: MoeConfig, params, cache, token, pos, h=None, *,
                quantized: bool = False, method: str = "quest"):
    """One MoE decode step (see serving.decode_step)."""
    return _serving.decode_step(cfg, params, cache, token, pos, h,
                                quantized=quantized, method=method,
                                mlp=_moe_mlp_block)


def generate(cfg: MoeConfig, params, prompt, h=None, **kw):
    """MoE generation with the full sampling surface (see serving.generate)."""
    return _serving.generate(cfg, params, prompt, h, mlp=_moe_mlp_block, **kw)
