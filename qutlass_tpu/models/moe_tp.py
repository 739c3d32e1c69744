"""Expert-parallel + tensor-parallel MoE serving over a mesh.

Extends :mod:`serving_tp` to the MoE family: attention is sharded
Megatron-style (heads over ``tp``) and the expert stacks are sharded
over the *same* axis (``n_experts / tp`` experts per shard).  Because
activations are replicated between the per-layer psums, expert
parallelism needs **no all_to_all** here: every shard routes all
tokens (identical router on identical inputs), computes only its local
experts' contributions, and the block's existing ``reduce = psum``
sums the partial expert outputs together with the row-parallel
attention output — still two collectives per layer.

(The all_to_all formulation in ``parallel.strategies.moe_mlp_ep`` is
the *training* shape, where tokens are sequence-sharded; in serving
the activations are small and replicated, so summing partial expert
outputs is both simpler and cheaper.)

Expert weights must be stacked for sharding (a Python list of
per-expert dicts has no shardable axis): :func:`stack_experts`
converts the tree from ``models.moe.quantize_model_weights`` /
``init_params``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import serving_tp as _stp
from .moe import MoeConfig, topk_dispatch
from .serving_tp import _wspec
from .transformer import _linear


def stack_experts(cfg: MoeConfig, params):
    """Stack each layer's per-expert weight list along a new expert axis.

    Quantized experts ``[{wqt, wst}] * E`` become
    ``{"wqt": [E, K/2, N], "wst": [E, K/gs, N]}``; bf16 experts are
    already stacked ``[E, N, K]`` arrays and pass through.
    """
    out = dict(params)
    out["layers"] = []
    for layer in params["layers"]:
        ql = dict(layer)
        for name in ("expert_gate", "expert_up", "expert_down"):
            w = layer[name]
            if isinstance(w, (list, tuple)):
                if any(set(e) != set(w[0]) for e in w):
                    raise ValueError(
                        f"{name}: experts carry heterogeneous stored "
                        f"formats ({sorted(set(frozenset(e) for e in w), key=sorted)}); "
                        "stacks must be format-uniform — quantize via "
                        "moe.quantize_model_weights (which demotes mixed "
                        "int8/fp4 stacks to fp4) before stacking")
                ql[name] = {k: jnp.stack([e[k] for e in w]) for k in w[0]}
        out["layers"].append(ql)
    return out


def param_specs(cfg: MoeConfig, quantized: bool = True, axis: str = "tp",
                params=None):
    """PartitionSpec tree for stacked MoE params.

    ``params`` (the STACKED tree) keys each weight's spec dict off the
    stored operand formats (fp4 {wqt, wst} / int8 {wi8, wsb} / NV
    {nvi8, nvsb, gs}); expert stacks shard dim 0 over the EP axis,
    with rank-matched specs per operand (wsb/nvsb stack to rank 2, gs
    to rank 1).
    """
    expert_by_key = {"wqt": P(axis, None, None), "wst": P(axis, None, None),
                     "wi8": P(axis, None, None), "wsb": P(axis, None),
                     # NV int8 stacks: nvi8 [E, K, N], nvsb [E, N],
                     # per-expert global scale gs [E]
                     "nvi8": P(axis, None, None), "nvsb": P(axis, None),
                     "gs": P(axis),
                     # abs_max marker stacks to [E]
                     "am": P(axis)}
    specs = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": [],
    }
    for li in range(cfg.num_layers):
        layer = {"input_norm": P(None), "post_attn_norm": P(None),
                 "router": P(None, None)}
        if cfg.qk_norm:
            layer["q_norm"] = P(None)
            layer["k_norm"] = P(None)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            keys = None
            if quantized and params is not None:
                keys = tuple(params["layers"][li][nm].keys())
            layer[nm] = _wspec(nm, quantized, axis, keys)
        for nm in ("expert_gate", "expert_up", "expert_down"):
            if not quantized:
                layer[nm] = P(axis, None, None)
            elif params is not None:
                layer[nm] = {k: expert_by_key[k]
                             for k in params["layers"][li][nm]}
            else:
                layer[nm] = {"wqt": expert_by_key["wqt"],
                             "wst": expert_by_key["wst"]}
        specs["layers"].append(layer)
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


def shard_params(cfg: MoeConfig, params, mesh: Mesh, *,
                 quantized: bool = True, axis: str = "tp"):
    """stack_experts + device_put with the EP/TP NamedShardings."""
    stacked = stack_experts(cfg, params)
    specs = param_specs(cfg, quantized, axis, stacked)
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs, stacked, is_leaf=lambda s: isinstance(s, P))


def _moe_mlp_tp(gcfg: MoeConfig, axis: str):
    """serving ``mlp`` hook: local-experts partial MoE output [B, T, D].

    The caller's ``reduce = psum`` completes the sum over experts.
    """
    def hook(scfg, layer, xin, h, method, quantized):
        b, t, d = xin.shape
        x2 = xin.reshape(b * t, d)
        m = b * t
        # same lossless clamp as moe._moe_mlp (occupancy <= m)
        cap = min(m, max(32, int(2 * gcfg.top_k * m / gcfg.n_experts)))
        logits = x2.astype(jnp.float32) @ jnp.asarray(layer["router"],
                                                      jnp.float32)
        dispatch, gates = topk_dispatch(logits, gcfg.top_k, cap)

        ep = lax.psum(1, axis)
        e_local = gcfg.n_experts // ep
        e0 = lax.axis_index(axis) * e_local
        disp_l = lax.dynamic_slice_in_dim(dispatch, e0, e_local, axis=1)
        gates_l = lax.dynamic_slice_in_dim(gates, e0, e_local, axis=1)

        buf = jnp.einsum("mec,md->ecd", disp_l,
                         x2.astype(jnp.float32)).astype(jnp.bfloat16)
        outs = []
        for e in range(e_local):
            we = {k: v[e] for k, v in layer["expert_gate"].items()} \
                if quantized else layer["expert_gate"][e]
            wu = {k: v[e] for k, v in layer["expert_up"].items()} \
                if quantized else layer["expert_up"][e]
            wd = {k: v[e] for k, v in layer["expert_down"].items()} \
                if quantized else layer["expert_down"][e]
            ge = _linear(buf[e], we, h, method, quantized)
            up = _linear(buf[e], wu, h, method, quantized)
            act = (jax.nn.silu(ge.astype(jnp.float32))
                   * up.astype(jnp.float32)).astype(jnp.bfloat16)
            outs.append(_linear(act, wd, h, method, quantized))
        back = jnp.stack(outs).astype(jnp.float32)        # [e_local, cap, d]
        comb = jnp.einsum("mec,ecd->med", disp_l, back)
        y = jnp.einsum("med,me->md", comb, gates_l)       # partial over local
        # fp32 partials: _block's reduce psums unrounded and casts once
        # (the same near-bitwise-vs-single-device property as the dense
        # TP path, serving.py:_block)
        return y.reshape(b, t, d)
    return hook


def _check(cfg: MoeConfig, mesh: Mesh, axis: str):
    tp = mesh.shape[axis]
    assert cfg.n_experts % tp == 0, (cfg.n_experts, tp)


def tp_prefill(cfg: MoeConfig, params, tokens, h, mesh: Mesh, **kw):
    """Sharded MoE prefill (serving_tp.tp_prefill with the MoE hooks)."""
    _check(cfg, mesh, kw.get("axis", "tp"))
    return _stp.tp_prefill(cfg, params, tokens, h, mesh,
                           specs_fn=param_specs, mlp_factory=_moe_mlp_tp,
                           **kw)


def tp_decode_step(cfg: MoeConfig, params, cache, token, pos, h,
                   mesh: Mesh, **kw):
    """One sharded MoE decode step (serving_tp.tp_decode_step)."""
    _check(cfg, mesh, kw.get("axis", "tp"))
    return _stp.tp_decode_step(cfg, params, cache, token, pos, h, mesh,
                               specs_fn=param_specs,
                               mlp_factory=_moe_mlp_tp, **kw)


def tp_generate(cfg: MoeConfig, params, prompt, h, mesh: Mesh, **kw):
    """Sharded MoE generation: one shard_map dispatch (serving_tp)."""
    _check(cfg, mesh, kw.get("axis", "tp"))
    return _stp.tp_generate(cfg, params, prompt, h, mesh,
                            specs_fn=param_specs, mlp_factory=_moe_mlp_tp,
                            **kw)


def engine(cfg: MoeConfig, params, h, mesh: Mesh, **kw):
    """Continuous-batching engine with the MoE hooks: every batcher
    dispatch runs expert-parallel over the mesh (serving_tp.TPEngine
    with specs/mlp from this module; pass as ``engine=`` to
    models.continuous.ContinuousBatcher)."""
    _check(cfg, mesh, kw.get("axis", "tp"))
    return _stp.TPEngine(cfg, params, h, mesh, specs_fn=param_specs,
                         mlp_factory=_moe_mlp_tp, **kw)
