"""HF-Transformers checkpoint import for the in-repo model family.

Maps Hugging Face Qwen3 / Llama state-dict naming onto the param tree of
``qutlass_tpu.models.transformer`` so real checkpoints can run through
the W4A4 path (the reference defers this to its HF integration,
README.md:50-51).

Works from a dict of numpy arrays (e.g. loaded from safetensors shards
via ``safetensors.numpy`` or ``transformers``) — no network access is
required here.
"""
from __future__ import annotations

import re
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from .transformer import ModelConfig


_LAYER_MAP = {
    "input_layernorm.weight": "input_norm",
    "post_attention_layernorm.weight": "post_attn_norm",
    "self_attn.q_proj.weight": "q_proj",
    "self_attn.k_proj.weight": "k_proj",
    "self_attn.v_proj.weight": "v_proj",
    "self_attn.o_proj.weight": "o_proj",
    "self_attn.q_norm.weight": "q_norm",
    "self_attn.k_norm.weight": "k_norm",
    "mlp.gate_proj.weight": "gate_proj",
    "mlp.up_proj.weight": "up_proj",
    "mlp.down_proj.weight": "down_proj",
}


def config_from_hf(hf_config: Mapping) -> ModelConfig:
    """Build a ModelConfig from an HF config dict (Qwen3/Llama style)."""
    qk_norm = str(hf_config.get("model_type", "")).startswith("qwen3") or \
        "qwen3" in str(hf_config.get("architectures", "")).lower()
    return ModelConfig(
        vocab_size=hf_config["vocab_size"],
        hidden_size=hf_config["hidden_size"],
        intermediate_size=hf_config["intermediate_size"],
        num_layers=hf_config["num_hidden_layers"],
        num_heads=hf_config["num_attention_heads"],
        num_kv_heads=hf_config.get("num_key_value_heads",
                                   hf_config["num_attention_heads"]),
        head_dim=hf_config.get(
            "head_dim",
            hf_config["hidden_size"] // hf_config["num_attention_heads"]),
        rope_theta=hf_config.get("rope_theta", 1e6),
        rms_eps=hf_config.get("rms_norm_eps", 1e-6),
        qk_norm=qk_norm,
        tie_embeddings=hf_config.get("tie_word_embeddings", False),
        sliding_window=(hf_config.get("sliding_window")
                        if hf_config.get("use_sliding_window", True)
                        else None),
    )


def params_from_hf_state_dict(cfg: ModelConfig,
                              state: Mapping[str, np.ndarray],
                              dtype=jnp.bfloat16):
    """Convert an HF state dict (torch key naming) to the params pytree.

    Linear weights keep HF's [out, in] orientation (ours matches).
    Missing optional keys (q_norm for Llama, lm_head when tied) are
    handled per config.
    """
    def get(k):
        if k not in state:
            raise KeyError(f"missing checkpoint tensor: {k}")
        return jnp.asarray(np.asarray(state[k]), dtype)

    layers = []
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}."
        layer = {}
        for hf_name, ours in _LAYER_MAP.items():
            if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
                continue
            layer[ours] = get(prefix + hf_name)
        layers.append(layer)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight")
    return params


def moe_config_from_hf(hf_config: Mapping):
    """Build a MoeConfig from an HF MoE config dict (qwen3_moe or
    mixtral — Mixtral's softmax-over-top-k-logits gating is the same
    function as our softmax-then-renormalize-over-picks, so only the
    config/tensor naming differs)."""
    from .moe import MoeConfig

    if hf_config.get("mlp_only_layers") or \
            hf_config.get("decoder_sparse_step", 1) != 1:
        raise NotImplementedError(
            "mixed dense/MoE layer stacks (mlp_only_layers / "
            "decoder_sparse_step) are not supported")
    import dataclasses

    base = config_from_hf(hf_config)
    if hf_config.get("model_type") == "mixtral" or \
            "num_local_experts" in hf_config:
        return MoeConfig(
            **dataclasses.asdict(base),
            n_experts=hf_config["num_local_experts"],
            top_k=hf_config["num_experts_per_tok"],
            moe_intermediate=hf_config["intermediate_size"])
    return MoeConfig(
        **dataclasses.asdict(base),
        n_experts=hf_config["num_experts"],
        top_k=hf_config["num_experts_per_tok"],
        moe_intermediate=hf_config["moe_intermediate_size"])


def moe_params_from_hf_state_dict(cfg, state: Mapping[str, np.ndarray],
                                  dtype=jnp.bfloat16):
    """Convert an HF MoE state dict to the MoE params pytree.

    Attention/norm tensors map as in the dense family; per layer the
    router is ``{mlp,block_sparse_moe}.gate.weight`` ([E, D] -> stored
    [D, E] f32) and the per-expert projections stack to
    ``expert_{gate,up,down}`` [E, ...] (the init_params layout).
    Naming scheme auto-detected: qwen3_moe uses
    ``mlp.experts.{e}.{gate,up,down}_proj.weight``; mixtral uses
    ``block_sparse_moe.experts.{e}.{w1,w3,w2}.weight`` (w1=gate,
    w3=up, w2=down).
    """
    def get(k, dt=dtype):
        if k not in state:
            raise KeyError(f"missing checkpoint tensor: {k}")
        return jnp.asarray(np.asarray(state[k]), dt)

    mixtral = any(".block_sparse_moe." in k for k in state)
    moe_pre = "block_sparse_moe." if mixtral else "mlp."
    proj_map = ((("w1", "expert_gate"), ("w3", "expert_up"),
                 ("w2", "expert_down")) if mixtral else
                (("gate_proj", "expert_gate"), ("up_proj", "expert_up"),
                 ("down_proj", "expert_down")))
    layers = []
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}."
        layer = {}
        for hf_name, ours in _LAYER_MAP.items():
            if hf_name.startswith("mlp."):
                continue
            if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
                continue
            layer[ours] = get(prefix + hf_name)
        layer["router"] = get(prefix + moe_pre + "gate.weight",
                              jnp.float32).T
        for proj, ours in proj_map:
            layer[ours] = jnp.stack([
                get(f"{prefix}{moe_pre}experts.{e}.{proj}.weight")
                for e in range(cfg.n_experts)])
        layers.append(layer)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight")
    return params


_QUANT_LINEARS = ("self_attn.q_proj", "self_attn.k_proj",
                  "self_attn.v_proj", "self_attn.o_proj",
                  "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj")


def _state_getters(state: Mapping[str, np.ndarray], weight_format: str,
                   dtype):
    """(get, get_quantized) closures over a pre-quantized state dict:
    ``get(key)`` loads a plain tensor as ``dtype``; ``get_quantized
    (base_name)`` imports ``<base>.weight_packed``/``.weight_scale``
    [/``.weight_global_scale``] into a stored evaluator dict (MX vs NV
    keyed on the global scale's presence)."""
    from ..io import import_mxfp4_weight, import_nvfp4_weight

    def get(k, dt=dtype):
        if k not in state:
            raise KeyError(f"missing checkpoint tensor: {k}")
        return jnp.asarray(np.asarray(state[k]), dt)

    def get_quantized(name):
        packed = state.get(name + ".weight_packed")
        if packed is None:
            raise KeyError(f"missing checkpoint tensor: {name}"
                           ".weight_packed (not a quantized checkpoint?)")
        packed = np.asarray(packed)
        if packed.dtype != np.uint8:
            raise NotImplementedError(
                f"{name}.weight_packed has dtype {packed.dtype}; only "
                "uint8 e2m1-nibble checkpoints (nvfp4/mxfp4 "
                "pack-quantized) are supported — int32-packed schemes "
                "(GPTQ/AWQ/int4) are a different format")
        packed = jnp.asarray(packed)
        scales = jnp.asarray(
            np.asarray(state[name + ".weight_scale"]).view(np.uint8))
        # per-tensor global scale, two on-disk conventions:
        #  * compressed-tensors `weight_global_scale` is the QUANT-side
        #    multiplier (448*6/amax) — our gs as-is;
        #  * modelopt `weight_scale_2` is the second-level DEQUANT
        #    multiplier (actual group scale = e4m3_byte *
        #    weight_scale_2, vLLM reciprocates it) — gs = 1/ws2.
        gs = state.get(name + ".weight_global_scale")
        if gs is None:
            ws2 = state.get(name + ".weight_scale_2")
            if ws2 is not None:
                gs = 1.0 / np.float32(np.asarray(ws2).ravel()[0])
        k = 2 * packed.shape[1]
        nv = gs is not None or scales.size == packed.shape[0] * (k // 16)
        if nv:
            if gs is None:
                raise KeyError(
                    f"{name}: group-16 (NVFP4) scales but no per-tensor "
                    "global scale (weight_global_scale / weight_scale_2) "
                    "in the checkpoint")
            # modelopt-style static activation scale (dequant
            # multiplier) -> gsx = 1/input_scale, skips the per-call
            # rotated-amax pass (io.import_nvfp4_weight)
            in_s = state.get(name + ".input_scale")
            return import_nvfp4_weight(
                packed, scales, np.float32(np.asarray(gs).ravel()[0]),
                weight_format=weight_format,
                input_scale=(None if in_s is None
                             else np.float32(np.asarray(in_s).ravel()[0])))
        return import_mxfp4_weight(packed, scales,
                                   weight_format=weight_format)

    return get, get_quantized


def quantized_moe_params_from_hf_state_dict(cfg,
                                            state: Mapping[str, np.ndarray],
                                            weight_format: str = "int8",
                                            dtype=jnp.bfloat16):
    """Pre-quantized qwen3_moe checkpoint (compressed-tensors naming on
    the attention projections and every ``mlp.experts.{e}.*_proj``) ->
    quantized MoE params pytree (per-expert lists of stored evaluator
    dicts, the layout ``moe.quantize_model_weights`` produces).  The
    router and norms load as plain tensors."""
    get, get_quantized = _state_getters(state, weight_format, dtype)
    _, get_fp4 = _state_getters(state, "fp4", dtype)

    layers = []
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}."
        layer = {}
        for hf_name, ours in _LAYER_MAP.items():
            if hf_name.startswith("mlp."):
                continue
            if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
                continue
            base = hf_name[: -len(".weight")]
            if base in _QUANT_LINEARS:
                layer[ours] = get_quantized(prefix + base)
            else:
                layer[ours] = get(prefix + hf_name)
        # naming scheme: qwen3_moe (mlp.experts.{e}.{gate,up,down}_proj)
        # or mixtral (block_sparse_moe.experts.{e}.{w1,w3,w2})
        mixtral = any(".block_sparse_moe." in k for k in state)
        moe_pre = "block_sparse_moe." if mixtral else "mlp."
        proj_map = ((("w1", "expert_gate"), ("w3", "expert_up"),
                     ("w2", "expert_down")) if mixtral else
                    (("gate_proj", "expert_gate"), ("up_proj", "expert_up"),
                     ("down_proj", "expert_down")))
        layer["router"] = get(prefix + moe_pre + "gate.weight",
                              jnp.float32).T
        for proj, ours in proj_map:
            names = [f"{prefix}{moe_pre}experts.{e}.{proj}"
                     for e in range(cfg.n_experts)]
            qs = [get_quantized(n) for n in names]
            # expert stacks must be format-uniform for EP/TP stacking
            # (see moe.quantize_model_weights): demote to fp4 if mixed
            if any(set(d) != set(qs[0]) for d in qs):
                qs = [d if "wi8" not in d else get_fp4(n)
                      for n, d in zip(names, qs)]
            layer[ours] = qs
        layers.append(layer)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight")
    return params


def quantized_params_from_hf_state_dict(cfg: ModelConfig,
                                        state: Mapping[str, np.ndarray],
                                        weight_format: str = "int8",
                                        dtype=jnp.bfloat16):
    """Convert a PRE-QUANTIZED HF state dict (compressed-tensors /
    vLLM naming) to the quantized params pytree.

    Each linear stores ``<name>.weight_packed`` (u8 [N, K/2], two e2m1
    per byte, element 2i in the low nibble), ``<name>.weight_scale``
    (u8 scale bytes [N, K/gs]) and, for the NVFP4 two-level scheme,
    ``<name>.weight_global_scale`` (f32 scalar) — the on-disk layout of
    checkpoints produced by the reference's integrations (vLLM PR
    #24440 / FP-Quant, reference README.md:50,66,80).  MX vs NV is
    keyed per tensor on the presence of the global scale.  Non-linear
    tensors (norms, embeddings, lm_head) load as ``dtype``.

    Serve the result with ``quantized=True`` and the rotation the
    checkpoint was quantized with — ``identity_matrix(gs)`` for plain
    (unrotated) vLLM-style checkpoints, the matching Hadamard for
    FP-Quant/Quartet ones.
    """
    get, get_quantized = _state_getters(state, weight_format, dtype)

    layers = []
    for i in range(cfg.num_layers):
        prefix = f"model.layers.{i}."
        layer = {}
        for hf_name, ours in _LAYER_MAP.items():
            if ours in ("q_norm", "k_norm") and not cfg.qk_norm:
                continue
            base = hf_name[: -len(".weight")]
            if base in _QUANT_LINEARS:
                layer[ours] = get_quantized(prefix + base)
            else:
                layer[ours] = get(prefix + hf_name)
        layers.append(layer)

    params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight"),
        "layers": layers,
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = get("lm_head.weight")
    return params


def load_model(path: str, *, quantize: bool = False, h=None,
               method: str = "quest", fmt: str = "mx",
               weight_format: str = "int8", dtype=jnp.bfloat16):
    """One-call checkpoint load: HF model directory -> (cfg, params).

    ``path`` must contain ``config.json`` plus ``*.safetensors`` shards
    (the standard HF snapshot layout).  With ``quantize=True`` every
    linear weight is rotated by ``h`` (defaults to the Hadamard-32) and
    stored MXFP4 (or NVFP4 with ``fmt="nv"``; ``weight_format`` picks
    the stored evaluator operand as in ``quantize_model_weights``) —
    the one-line equivalent of the reference's HF-integration layer
    swap (README.md:50-51).

    A checkpoint that is ALREADY quantized (``quantization_config`` in
    config.json, weights stored as ``weight_packed``/``weight_scale``)
    loads through :func:`quantized_params_from_hf_state_dict` instead;
    ``quantize``/``method``/``fmt`` are ignored for it.

    ``model_type="qwen3_moe"`` / ``"mixtral"`` checkpoints route to
    the MoE family
    (:func:`moe_params_from_hf_state_dict`; quantization via
    ``models.moe.quantize_model_weights``).
    """
    import json
    import os

    with open(os.path.join(path, "config.json")) as f:
        hf_cfg = json.load(f)
    state = load_safetensors_dir(path)

    moe = (hf_cfg.get("model_type") in ("qwen3_moe", "mixtral")
           or "num_experts" in hf_cfg or "num_local_experts" in hf_cfg)
    prequantized = any(k.endswith(".weight_packed") for k in state)
    qc = hf_cfg.get("quantization_config")
    if qc and not prequantized:
        blob = json.dumps(qc).lower()
        if not any(t in blob for t in ("fp4", "float4", "e2m1")):
            raise NotImplementedError(
                "checkpoint carries a quantization_config for an "
                f"unsupported scheme ({qc.get('quant_method', qc)}); only "
                "fp4 pack-quantized (nvfp4/mxfp4) checkpoints are "
                "importable")
        prequantized = True
    if moe:
        from .moe import quantize_model_weights
        cfg = moe_config_from_hf(hf_cfg)
        if prequantized:
            return cfg, quantized_moe_params_from_hf_state_dict(
                cfg, state, weight_format=weight_format, dtype=dtype)
        params = moe_params_from_hf_state_dict(cfg, state, dtype=dtype)
    else:
        from .transformer import quantize_model_weights
        cfg = config_from_hf(hf_cfg)
        if prequantized:
            return cfg, quantized_params_from_hf_state_dict(
                cfg, state, weight_format=weight_format, dtype=dtype)
        params = params_from_hf_state_dict(cfg, state, dtype=dtype)
    if quantize:
        if h is None:
            from ..utils import hadamard_matrix
            h = hadamard_matrix(32)
        params = quantize_model_weights(cfg, params, h, method=method,
                                        fmt=fmt,
                                        weight_format=weight_format)
    return cfg, params


def load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    """Load all *.safetensors shards under ``path`` into one numpy dict."""
    import glob
    import os
    from safetensors import safe_open

    state: dict[str, np.ndarray] = {}
    for shard in sorted(glob.glob(os.path.join(path, "*.safetensors"))):
        with safe_open(shard, framework="numpy") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    if not state:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return state
