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

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .moe import MoeConfig, topk_dispatch
from .serving import _logits, init_cache, sample_logits
from .serving_tp import _cache_spec, _run_blocks, _wspec, shard_cfg
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
                ql[name] = {k: jnp.stack([e[k] for e in w]) for k in w[0]}
        out["layers"].append(ql)
    return out


def param_specs(cfg: MoeConfig, quantized: bool = True, axis: str = "tp"):
    """PartitionSpec tree for stacked MoE params."""
    layer = {"input_norm": P(None), "post_attn_norm": P(None),
             "router": P(None, None)}
    if cfg.qk_norm:
        layer["q_norm"] = P(None)
        layer["k_norm"] = P(None)
    for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
        layer[nm] = _wspec(nm, quantized, axis)
    for nm in ("expert_gate", "expert_up", "expert_down"):
        spec = P(axis, None, None)
        layer[nm] = {"wqt": spec, "wst": spec} if quantized else spec
    specs = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": [dict(layer) for _ in range(cfg.num_layers)],
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


def shard_params(cfg: MoeConfig, params, mesh: Mesh, *,
                 quantized: bool = True, axis: str = "tp"):
    """stack_experts + device_put with the EP/TP NamedShardings."""
    stacked = stack_experts(cfg, params)
    specs = param_specs(cfg, quantized, axis)
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
        cap = max(32, int(2 * gcfg.top_k * m / gcfg.n_experts))
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
        return y.reshape(b, t, d).astype(jnp.bfloat16)
    return hook


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "max_len", "quantized",
                                             "method"))
def tp_prefill(cfg: MoeConfig, params, tokens, h, mesh: Mesh, *,
               max_len: int, quantized: bool = True,
               method: str = "quest", axis: str = "tp"):
    """Sharded MoE prefill (see serving_tp.tp_prefill)."""
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    assert cfg.n_experts % tp == 0, (cfg.n_experts, tp)
    b = tokens.shape[0]
    mlp = _moe_mlp_tp(cfg, axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs(cfg, quantized, axis), P(None, None)),
        out_specs=(P(None, None), _cache_spec(cfg, axis)),
        check_rep=False)
    def run(p, toks):
        cache = init_cache(scfg, b, max_len)
        x = p["embed"][toks]
        x, cache = _run_blocks(scfg, p, x, cache, 0, h, method, quantized,
                               axis, mlp=mlp)
        return _logits(scfg, p, x[:, -1]), cache

    return run(params, tokens)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "quantized", "method"))
def tp_decode_step(cfg: MoeConfig, params, cache, token, pos, h,
                   mesh: Mesh, *, quantized: bool = True,
                   method: str = "quest", axis: str = "tp"):
    """One sharded MoE decode step (see serving_tp.tp_decode_step)."""
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    mlp = _moe_mlp_tp(cfg, axis)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs(cfg, quantized, axis), _cache_spec(cfg, axis),
                  P(None), P()),
        out_specs=(P(None, None), _cache_spec(cfg, axis)),
        check_rep=False)
    def run(p, cache, tok, ps):
        x = p["embed"][tok][:, None]
        x, cache = _run_blocks(scfg, p, x, cache, ps, h, method, quantized,
                               axis, mlp=mlp)
        return _logits(scfg, p, x[:, 0]), cache

    return run(params, cache, token, pos)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "steps",
                                             "max_len", "quantized", "method",
                                             "temperature", "top_k", "top_p",
                                             "eos_id", "pad_id"))
def tp_generate(cfg: MoeConfig, params, prompt, h, mesh: Mesh, *,
                steps: int, max_len: int, quantized: bool = True,
                method: str = "quest", axis: str = "tp", key=None,
                temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
                eos_id: int | None = None, pad_id: int = 0):
    """Sharded MoE generation: one shard_map dispatch (see serving_tp)."""
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    b, t = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    mlp = _moe_mlp_tp(cfg, axis)

    def pick(logits, k):
        return sample_logits(logits, k, temperature=temperature,
                             top_k=top_k, top_p=top_p)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs(cfg, quantized, axis), P(None, None), P(None)),
        out_specs=P(None, None),
        check_rep=False)
    def run(p, prompt, key):
        cache = init_cache(scfg, b, max_len)
        x = p["embed"][prompt]
        x, cache = _run_blocks(scfg, p, x, cache, 0, h, method, quantized,
                               axis, mlp=mlp)
        key, k0 = jax.random.split(key)
        first = pick(_logits(scfg, p, x[:, -1]), k0)
        done0 = jnp.zeros((b,), bool)

        def step(carry, k):
            token, pos, cache, done = carry
            x = p["embed"][token][:, None]
            x, cache = _run_blocks(scfg, p, x, cache, pos, h, method,
                                   quantized, axis, mlp=mlp)
            nxt = pick(_logits(scfg, p, x[:, 0]), k)
            out = jnp.where(done, pad_id, token)
            if eos_id is not None:
                done = done | (token == eos_id)
            return (nxt, pos + 1, cache, done), out

        keys = jax.random.split(key, steps)
        (_, _, _, _), toks = jax.lax.scan(
            step, (first, jnp.int32(t), cache, done0), keys)
        return jnp.swapaxes(toks, 0, 1)

    return run(params, prompt, key)
