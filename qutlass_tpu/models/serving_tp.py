"""Tensor-parallel quantized serving over a ``jax.sharding.Mesh``.

Megatron-style sharding of the W4A4 transformer for multi-chip
inference — the layer the reference delegates to vLLM's TP engine
(reference README.md:66; the kernels themselves are shard-transparent,
SURVEY.md §2.10).  Heads and MLP columns are sharded over the ``tp``
mesh axis; the attention-output and MLP-down projections produce
partial sums that one ``psum`` per branch restores (two collectives
per layer, riding ICI).  The KV cache is sharded over heads, so cache
memory also scales 1/tp.

Quantization commutes with this sharding: rotation/scale groups are 32
elements along K and every shard boundary here is a multiple of the
head/group size, so per-shard quantize produces exactly the bytes of
the full-tensor quantize restricted to the shard (scales shard like
their data).  Outputs differ from single-chip only by the fp32
summation order of the psum.

All entry points take params already placed with
:func:`shard_params` and run a single ``shard_map`` dispatch.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import lax
from qutlass_tpu.parallel.compat import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .serving import _block, _logits, init_cache, sample_logits
from .transformer import ModelConfig


def shard_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    """The per-shard view of the model: heads and MLP columns / tp."""
    assert cfg.num_heads % tp == 0, (cfg.num_heads, tp)
    assert cfg.num_kv_heads % tp == 0, (cfg.num_kv_heads, tp)
    assert cfg.intermediate_size % tp == 0
    # per-shard K of the o_proj / rotation groups must stay whole
    assert (cfg.num_heads // tp) * cfg.head_dim % 32 == 0
    assert (cfg.intermediate_size // tp) % 32 == 0
    return dataclasses.replace(
        cfg, num_heads=cfg.num_heads // tp,
        num_kv_heads=cfg.num_kv_heads // tp,
        intermediate_size=cfg.intermediate_size // tp)


def _wspec(name: str, quantized: bool, axis: str, keys=None):
    """PartitionSpec for one projection weight.

    Column-parallel (q/k/v/gate/up): output dim sharded.  Row-parallel
    (o/down): input (K) dim sharded.  Quantized weight dicts carry any
    of: kmajor fp4 {wqt [K/2, N], wst [K/gs, N]} (output dim = axis 1,
    K = axis 0), int8 {wi8 [N, K], wsb [N]} (ops/int8path.py — output
    dim = axis 0; wsb is per-OUTPUT-row, so row-parallel leaves it
    replicated), NVFP4 adds a replicated scalar {gs}.  bf16 weights are
    [N, K] (out, in).
    """
    col = name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
    if not quantized:
        return P(axis, None) if col else P(None, axis)
    kspec = P(None, axis) if col else P(axis, None)
    by_key = {
        "wqt": kspec, "wst": kspec,
        "wi8": P(axis, None) if col else P(None, axis),
        "wsb": P(axis) if col else P(None),
        # NV int8 operand is natural-K-order [K, N] (row k = element k,
        # ops/int8path.prepare_weight_nv_int8), so a contiguous K-shard
        # IS the shard's local operand; its f32 row scale is
        # per-OUTPUT-row like wsb
        "nvi8": kspec,
        "nvsb": P(axis) if col else P(None),
        "gs": P(),
        "gsx": P(),     # static calibrated activation scale, replicated
        "am": P(),      # abs_max marker scalar, replicated
    }
    keys = keys if keys is not None else ("wqt", "wst")
    return {k: by_key[k] for k in keys}


def param_specs(cfg: ModelConfig, quantized: bool = True, axis: str = "tp",
                params=None):
    """PartitionSpec pytree matching (quantized) transformer params.

    Pass ``params`` to key each projection's spec dict off the actual
    stored operand formats (fp4 / int8 / NV) instead of assuming fp4.
    """
    layer = {
        "input_norm": P(None), "post_attn_norm": P(None),
    }
    if cfg.qk_norm:
        layer["q_norm"] = P(None)
        layer["k_norm"] = P(None)
    specs = {
        "embed": P(None, None),
        "final_norm": P(None),
        "layers": [],
    }
    for li in range(cfg.num_layers):
        ld = dict(layer)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                   "up_proj", "down_proj"):
            keys = None
            if quantized and params is not None:
                keys = tuple(params["layers"][li][nm].keys())
            ld[nm] = _wspec(nm, quantized, axis, keys)
        specs["layers"].append(ld)
    if not cfg.tie_embeddings:
        specs["lm_head"] = P(None, None)
    return specs


def shard_params(cfg: ModelConfig, params, mesh: Mesh, *,
                 quantized: bool = True, axis: str = "tp"):
    """device_put the param tree with the TP NamedShardings."""
    specs = param_specs(cfg, quantized, axis, params)
    # map over the spec tree (PartitionSpec is a tuple — stop there)
    return jax.tree.map(
        lambda s, x: jax.device_put(x, NamedSharding(mesh, s)),
        specs, params, is_leaf=lambda s: isinstance(s, P))


def _cache_spec(cfg: ModelConfig, axis: str, fmt: str = "bf16"):
    # cache k/v: [B, L, kv_heads, head_dim], heads sharded; the int8
    # format adds per-(position, head) scale planes ks/vs [B, L, KVH]
    one = {"k": P(None, None, axis, None), "v": P(None, None, axis, None)}
    if fmt == "int8":
        one.update(ks=P(None, None, axis), vs=P(None, None, axis))
    return [dict(one) for _ in range(cfg.num_layers)]


def _cache_fmt(cache) -> str:
    return "int8" if "ks" in cache[0] else "bf16"


def _run_blocks(scfg, params, x, caches, start_pos, h, method, quantized,
                axis, mlp=None):
    red = lambda y: lax.psum(y, axis)
    new = []
    for layer, cl in zip(params["layers"], caches):
        x, cl = _block(scfg, layer, x, cl, start_pos, h, method, quantized,
                       reduce=red, mlp=mlp)
        new.append(cl)
    return x, new


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "max_len", "quantized",
                                             "method", "specs_fn",
                                             "mlp_factory", "cache_format"))
def tp_prefill(cfg: ModelConfig, params, tokens, h, mesh: Mesh, *,
               max_len: int, quantized: bool = True,
               method: str = "quest", axis: str = "tp",
               specs_fn=None, mlp_factory=None, lengths=None,
               cache_format: str = "bf16"):
    """Sharded prefill: tokens [B, T] -> (logits [B, vocab], sharded cache).

    ``specs_fn(cfg, quantized, axis)`` / ``mlp_factory(cfg, axis)`` let
    model families reuse these entry points with their own param tree
    and MLP branch (models/moe_tp.py).  ``lengths`` [B] enables ragged
    batches exactly as in :func:`serving.prefill` (right-padded rows,
    logits read at lengths-1).
    """
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    b = tokens.shape[0]
    specs = (specs_fn or param_specs)(cfg, quantized, axis, params)
    mlp = mlp_factory(cfg, axis) if mlp_factory else None
    in_specs = (specs, P(None, None))
    if lengths is not None:
        in_specs += (P(None),)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=in_specs,
        out_specs=(P(None, None), _cache_spec(cfg, axis, cache_format)),
        check_rep=False)
    def run(p, toks, *ln):
        cache = init_cache(scfg, b, max_len, cache_format)
        x = p["embed"][toks]
        x, cache = _run_blocks(scfg, p, x, cache, 0, h, method, quantized,
                               axis, mlp=mlp)
        last = x[:, -1] if not ln else x[jnp.arange(b), ln[0] - 1]
        return _logits(scfg, p, last), cache

    args = (params, tokens) if lengths is None else (params, tokens, lengths)
    return run(*args)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "quantized", "method",
                                             "specs_fn", "mlp_factory"))
def tp_decode_step(cfg: ModelConfig, params, cache, token, pos, h,
                   mesh: Mesh, *, quantized: bool = True,
                   method: str = "quest", axis: str = "tp",
                   specs_fn=None, mlp_factory=None):
    """One sharded decode step: token [B] at traced position ``pos``
    (a scalar, or [B] for ragged batches — per-row decode positions,
    same semantics as :func:`serving.decode_step`)."""
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    specs = (specs_fn or param_specs)(cfg, quantized, axis, params)
    mlp = mlp_factory(cfg, axis) if mlp_factory else None
    pspec = P() if jnp.ndim(pos) == 0 else P(None)
    cspec = _cache_spec(cfg, axis, _cache_fmt(cache))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, cspec, P(None), pspec),
        out_specs=(P(None, None), cspec),
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
                                             "eos_id", "pad_id", "specs_fn",
                                             "mlp_factory",
                                             "return_logprobs"))
def tp_generate(cfg: ModelConfig, params, prompt, h, mesh: Mesh, *,
                steps: int, max_len: int, quantized: bool = True,
                method: str = "quest", axis: str = "tp", key=None,
                temperature: float = 0.0, top_k: int = 0, top_p: float = 1.0,
                eos_id: int | None = None, pad_id: int = 0,
                specs_fn=None, mlp_factory=None,
                return_logprobs: bool = False):
    """Sharded generation: one shard_map dispatch for prefill + decode scan.

    Sampling uses the same key on every shard, so all shards pick the
    same token without an extra collective.  ``return_logprobs=True``
    additionally returns per-token log-probabilities like
    :func:`serving.generate`.
    """
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    b, t = prompt.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    specs = (specs_fn or param_specs)(cfg, quantized, axis, params)
    mlp = mlp_factory(cfg, axis) if mlp_factory else None

    def pick(logits, k):
        return sample_logits(logits, k, temperature=temperature,
                             top_k=top_k, top_p=top_p)

    def lp_of(logits, token):
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[
            jnp.arange(b), token]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, P(None, None), P(None)),
        out_specs=(P(None, None), P(None, None)),
        check_rep=False)
    def run(p, prompt, key):
        cache = init_cache(scfg, b, max_len)
        x = p["embed"][prompt]
        x, cache = _run_blocks(scfg, p, x, cache, 0, h, method, quantized,
                               axis, mlp=mlp)
        key, k0 = jax.random.split(key)
        logits0 = _logits(scfg, p, x[:, -1])
        first = pick(logits0, k0)
        lp0 = lp_of(logits0, first) if return_logprobs else jnp.zeros((b,))
        done0 = jnp.zeros((b,), bool)

        def step(carry, k):
            token, lp, pos, cache, done = carry
            x = p["embed"][token][:, None]
            x, cache = _run_blocks(scfg, p, x, cache, pos, h, method,
                                   quantized, axis, mlp=mlp)
            logits = _logits(scfg, p, x[:, 0])
            nxt = pick(logits, k)
            nlp = lp_of(logits, nxt) if return_logprobs else lp
            out = (jnp.where(done, pad_id, token),
                   jnp.where(done, 0.0, lp))
            if eos_id is not None:
                done = done | (token == eos_id)
            return (nxt, nlp, pos + 1, cache, done), out

        keys = jax.random.split(key, steps)
        _, (toks, lps) = jax.lax.scan(
            step, (first, lp0, jnp.int32(t), cache, done0), keys)
        return jnp.swapaxes(toks, 0, 1), jnp.swapaxes(lps, 0, 1)

    toks, lps = run(params, prompt, key)
    return (toks, lps) if return_logprobs else toks


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis",
                                             "quantized", "method",
                                             "specs_fn", "mlp_factory"))
def tp_prefill_step(cfg: ModelConfig, params, cache, tokens, start_pos, h,
                    mesh: Mesh, *, quantized: bool = True,
                    method: str = "quest", axis: str = "tp",
                    specs_fn=None, mlp_factory=None):
    """Sharded chunk prefill into an EXISTING sharded cache at traced
    ``start_pos`` — the TP twin of :func:`serving.prefill_step`.
    Returns (hidden states x [B, C, D] replicated, sharded cache)."""
    tp = mesh.shape[axis]
    scfg = shard_cfg(cfg, tp)
    specs = (specs_fn or param_specs)(cfg, quantized, axis, params)
    mlp = mlp_factory(cfg, axis) if mlp_factory else None

    cspec = _cache_spec(cfg, axis, _cache_fmt(cache))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(specs, cspec, P(None, None), P()),
        out_specs=(P(None, None, None), cspec),
        check_rep=False)
    def run(p, cache, toks, ps):
        x = p["embed"][toks]
        x, cache = _run_blocks(scfg, p, x, cache, ps, h, method, quantized,
                               axis, mlp=mlp)
        return x, cache

    return run(params, cache, tokens, start_pos)


class TPEngine:
    """Continuous-batching engine over the TP mesh.

    Plugs the sharded prefill/decode entry points into
    :class:`models.continuous.ContinuousBatcher` (pass as ``engine=``):
    the slot scheduler stays host-side and identical; every device
    dispatch runs tensor-parallel, and the slot KV cache lives sharded
    over heads (cache memory scales 1/tp, like ``tp_generate``).
    ``params`` must already be placed with :func:`shard_params`.
    """

    def __init__(self, cfg: ModelConfig, params, h, mesh: Mesh, *,
                 axis: str = "tp", quantized: bool = True,
                 method: str = "quest", specs_fn=None, mlp_factory=None,
                 chunk: int | None = None, cache_format: str = "bf16"):
        self.cfg, self.params, self.h = cfg, params, h
        self.mesh, self.axis = mesh, axis
        self.chunk = chunk
        self.cache_format = cache_format
        self.kw = dict(quantized=quantized, method=method, axis=axis,
                       specs_fn=specs_fn, mlp_factory=mlp_factory)

    def init_cache(self, n: int, max_len: int):
        cache = init_cache(self.cfg, n, max_len, self.cache_format)
        spec = _cache_spec(self.cfg, self.axis, self.cache_format)
        return jax.tree.map(
            lambda s, x: jax.device_put(x, NamedSharding(self.mesh, s)),
            spec, cache, is_leaf=lambda s: isinstance(s, P))

    def _step_fn(self):
        def step(c, toks, pos):
            return tp_prefill_step(self.cfg, self.params, c, toks, pos,
                                   self.h, self.mesh, **self.kw)
        return step

    def prefill(self, tokens, length, max_len: int):
        if self.chunk:
            # final norm + head are replicated in the param specs, so
            # the logits run outside the shard_map on global arrays
            from .serving import _engine_prefill_chunked
            return _engine_prefill_chunked(
                self._step_fn(), self.init_cache(tokens.shape[0], max_len),
                tokens, length, max_len=max_len, chunk=self.chunk,
                cfg=self.cfg, params=self.params)
        return tp_prefill(self.cfg, self.params, tokens, self.h, self.mesh,
                          max_len=max_len, lengths=length,
                          cache_format=self.cache_format, **self.kw)

    def prefill_from(self, cache, tokens, start: int, max_len: int):
        """Continue prefill of a suffix [1, T'] from position ``start``
        into an existing sharded 1-row cache (prefix-cache
        continuation); returns (logits [1, V], cache)."""
        from .continuous import _bucket
        from .serving import _engine_prefill_from
        return _engine_prefill_from(
            self._step_fn(), cache, tokens, start, max_len=max_len,
            chunk=self.chunk, cfg=self.cfg, params=self.params,
            bucket=_bucket)

    def decode(self, cache, token, pos):
        return tp_decode_step(self.cfg, self.params, cache, token, pos,
                              self.h, self.mesh, **self.kw)
