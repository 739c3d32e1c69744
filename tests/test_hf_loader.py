"""HF checkpoint-mapping tests with a fabricated state dict."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qutlass_tpu.models import forward, tiny_config
from qutlass_tpu.models.hf_loader import (config_from_hf,
                                          params_from_hf_state_dict)


def _fake_state(cfg):
    rng = np.random.default_rng(0)
    qd = cfg.num_heads * cfg.head_dim
    kvd = cfg.num_kv_heads * cfg.head_dim
    s = {}
    s["model.embed_tokens.weight"] = rng.standard_normal(
        (cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    s["model.norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    s["lm_head.weight"] = rng.standard_normal(
        (cfg.vocab_size, cfg.hidden_size)).astype(np.float32) * 0.02
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        s[p + "input_layernorm.weight"] = np.ones(cfg.hidden_size, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(cfg.hidden_size,
                                                           np.float32)
        s[p + "self_attn.q_proj.weight"] = rng.standard_normal(
            (qd, cfg.hidden_size)).astype(np.float32) * 0.02
        s[p + "self_attn.k_proj.weight"] = rng.standard_normal(
            (kvd, cfg.hidden_size)).astype(np.float32) * 0.02
        s[p + "self_attn.v_proj.weight"] = rng.standard_normal(
            (kvd, cfg.hidden_size)).astype(np.float32) * 0.02
        s[p + "self_attn.o_proj.weight"] = rng.standard_normal(
            (cfg.hidden_size, qd)).astype(np.float32) * 0.02
        s[p + "self_attn.q_norm.weight"] = np.ones(cfg.head_dim, np.float32)
        s[p + "self_attn.k_norm.weight"] = np.ones(cfg.head_dim, np.float32)
        s[p + "mlp.gate_proj.weight"] = rng.standard_normal(
            (cfg.intermediate_size, cfg.hidden_size)).astype(np.float32) * 0.02
        s[p + "mlp.up_proj.weight"] = rng.standard_normal(
            (cfg.intermediate_size, cfg.hidden_size)).astype(np.float32) * 0.02
        s[p + "mlp.down_proj.weight"] = rng.standard_normal(
            (cfg.hidden_size, cfg.intermediate_size)).astype(np.float32) * 0.02
    return s


@pytest.mark.slow
def test_roundtrip_forward():
    cfg = tiny_config()
    params = params_from_hf_state_dict(cfg, _fake_state(cfg))
    tokens = jnp.zeros((1, 8), jnp.int32)
    logits = forward(cfg, params, tokens)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_config_from_hf():
    hf = dict(model_type="qwen3", vocab_size=1000, hidden_size=256,
              intermediate_size=512, num_hidden_layers=2,
              num_attention_heads=4, num_key_value_heads=2, head_dim=64,
              rope_theta=1e6, rms_norm_eps=1e-6)
    cfg = config_from_hf(hf)
    assert cfg.qk_norm and cfg.num_kv_heads == 2 and cfg.head_dim == 64


def test_missing_key_reports_name():
    cfg = tiny_config()
    s = _fake_state(cfg)
    del s["model.layers.0.mlp.up_proj.weight"]
    with pytest.raises(KeyError, match="up_proj"):
        params_from_hf_state_dict(cfg, s)


def test_load_model_one_call(tmp_path):
    """load_model: config.json + safetensors dir -> (cfg, params[, quantized])."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models.hf_loader import load_model

    cfg = tiny_config()
    state = _fake_state(cfg)
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    lcfg, params = load_model(str(tmp_path))
    assert lcfg.num_layers == cfg.num_layers and lcfg.qk_norm
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out = forward(lcfg, params, toks)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    from helpers import bf16_hadamard
    h = bf16_hadamard(32)
    qcfg, qparams = load_model(str(tmp_path), quantize=True, h=h)
    lw = qparams["layers"][0]["q_proj"]
    # default weight_format="int8" stores the int8-MXU operand
    assert set(lw) == {"wi8", "wsb"} and lw["wi8"].dtype == jnp.int8
    qout = forward(qcfg, qparams, toks, h, quantized=True)
    a = np.asarray(out, np.float32).ravel()
    b = np.asarray(qout, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.9, cos


@pytest.mark.slow
def test_load_model_nv_format(tmp_path):
    """load_model passes fmt/weight_format through to the quantizer:
    fmt="nv" stores NVFP4 weights (int8 evaluator operand by default,
    fp4 bytes with weight_format="fp4")."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models.hf_loader import load_model

    cfg = tiny_config()
    state = _fake_state(cfg)
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    from helpers import bf16_hadamard
    h = bf16_hadamard(32)
    qcfg, qparams = load_model(str(tmp_path), quantize=True, h=h,
                               fmt="nv")
    lw = qparams["layers"][0]["q_proj"]
    # NV int8 evaluator operand: natural-K int8 + f32 row scale + the
    # per-weight global scale
    assert {"nvi8", "nvsb", "gs"} <= set(lw), set(lw)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    qout = forward(qcfg, qparams, toks, h, quantized=True)
    assert np.isfinite(np.asarray(qout, np.float32)).all()

    _, fp4params = load_model(str(tmp_path), quantize=True, h=h,
                              fmt="nv", weight_format="fp4")
    lw4 = fp4params["layers"][0]["q_proj"]
    assert {"wqt", "wst", "gs"} <= set(lw4) and "nvi8" not in lw4, set(lw4)


@pytest.mark.slow
def test_load_model_qwen3_moe(tmp_path):
    """qwen3_moe checkpoint: router + per-expert weights stack into the
    MoE param tree; quantize=True runs the experts through W4A4."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models import moe
    from qutlass_tpu.models.hf_loader import load_model

    cfg = moe.tiny_moe_config()
    rng = np.random.default_rng(1)
    state = _fake_state(cfg)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}.mlp."
        for k in ("gate_proj", "up_proj", "down_proj"):
            del state[f"model.layers.{i}.mlp.{k}.weight"]
        state[p + "gate.weight"] = rng.standard_normal(
            (cfg.n_experts, cfg.hidden_size)).astype(np.float32) * 0.1
        for e in range(cfg.n_experts):
            ep = f"{p}experts.{e}."
            state[ep + "gate_proj.weight"] = rng.standard_normal(
                (cfg.moe_intermediate, cfg.hidden_size)
            ).astype(np.float32) * 0.02
            state[ep + "up_proj.weight"] = rng.standard_normal(
                (cfg.moe_intermediate, cfg.hidden_size)
            ).astype(np.float32) * 0.02
            state[ep + "down_proj.weight"] = rng.standard_normal(
                (cfg.hidden_size, cfg.moe_intermediate)
            ).astype(np.float32) * 0.02
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3_moe",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
        "num_experts": cfg.n_experts,
        "num_experts_per_tok": cfg.top_k,
        "moe_intermediate_size": cfg.moe_intermediate,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    lcfg, params = load_model(str(tmp_path))
    assert lcfg.n_experts == cfg.n_experts and lcfg.top_k == cfg.top_k
    # regression: qwen3_moe must get Qwen3's q/k norms (cfg equality
    # guarantees the jitted program matches tiny_moe_config's)
    assert lcfg == cfg
    assert params["layers"][0]["router"].shape == (cfg.hidden_size,
                                                  cfg.n_experts)
    assert params["layers"][0]["expert_up"].shape == (
        cfg.n_experts, cfg.moe_intermediate, cfg.hidden_size)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out = moe.forward(lcfg, params, toks)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    from helpers import bf16_hadamard
    h = bf16_hadamard(32)
    qcfg, qparams = load_model(str(tmp_path), quantize=True, h=h)
    lw = qparams["layers"][0]["expert_gate"][0]
    assert "wi8" in lw or "wqt" in lw, set(lw)
    qout = moe.forward(qcfg, qparams, toks, h, quantized=True)
    assert np.isfinite(np.asarray(qout, np.float32)).all()


@pytest.mark.slow
def test_load_model_prequantized_moe(tmp_path):
    """Pre-quantized qwen3_moe checkpoint: attention + every expert
    stored as weight_packed/weight_scale; loaded tree serves bitwise
    like the directly-quantized MoE params it was exported from."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.io import export_quantized_weight
    from qutlass_tpu.models import moe
    from qutlass_tpu.models.hf_loader import load_model

    from helpers import bf16_hadamard
    cfg = moe.tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(3))
    h = bf16_hadamard(32)
    direct = moe.quantize_model_weights(cfg, params, h, fmt="mx",
                                        weight_format="both")

    state = {
        "model.embed_tokens.weight": np.asarray(params["embed"],
                                                np.float32),
        "model.norm.weight": np.asarray(params["final_norm"], np.float32),
        "lm_head.weight": np.asarray(params["lm_head"], np.float32),
    }
    att = {"q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
           "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj"}
    norms = {"input_norm": "input_layernorm",
             "post_attn_norm": "post_attention_layernorm",
             "q_norm": "self_attn.q_norm", "k_norm": "self_attn.k_norm"}
    for i, layer in enumerate(direct["layers"]):
        p = f"model.layers.{i}."
        for ours, hf in norms.items():
            state[p + hf + ".weight"] = np.asarray(layer[ours], np.float32)
        for ours, hf in att.items():
            packed, scales = export_quantized_weight(layer[ours])
            state[p + hf + ".weight_packed"] = np.asarray(packed)
            state[p + hf + ".weight_scale"] = np.asarray(scales)
        state[p + "mlp.gate.weight"] = np.ascontiguousarray(
            np.asarray(layer["router"], np.float32).T)
        for proj, ours in (("gate_proj", "expert_gate"),
                           ("up_proj", "expert_up"),
                           ("down_proj", "expert_down")):
            for e in range(cfg.n_experts):
                packed, scales = export_quantized_weight(layer[ours][e])
                ep = f"{p}mlp.experts.{e}.{proj}."
                state[ep + "weight_packed"] = np.asarray(packed)
                state[ep + "weight_scale"] = np.asarray(scales)
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "qwen3_moe",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
        "num_experts": cfg.n_experts,
        "num_experts_per_tok": cfg.top_k,
        "moe_intermediate_size": cfg.moe_intermediate,
        "quantization_config": {"format": "mxfp4-pack-quantized"},
    }))

    # weight_format="both" makes the loaded tree structurally identical
    # to `direct` -> identical jit program -> bitwise forward (with
    # "int8" the trees differ in dead leaves; the re-fused program
    # shifts quantizer inputs by 1 ulp and MoE routing amplifies it —
    # the documented composite-jit sensitivity, docs/NUMERICS.md)
    lcfg, qparams = load_model(str(tmp_path), weight_format="both")
    for i, dl in enumerate(direct["layers"]):
        for ours in ("expert_gate", "expert_up", "expert_down"):
            for e in range(cfg.n_experts):
                got, want = qparams["layers"][i][ours][e], dl[ours][e]
                assert set(got) == set(want), (ours, e)
                for key in want:
                    np.testing.assert_array_equal(
                        np.asarray(got[key]), np.asarray(want[key]),
                        err_msg=f"{ours}[{e}].{key}")
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out_loaded = moe.forward(lcfg, qparams, toks, h, quantized=True)
    out_direct = moe.forward(cfg, direct, toks, h, quantized=True)
    np.testing.assert_array_equal(np.asarray(out_loaded),
                                  np.asarray(out_direct))


@pytest.mark.slow
def test_load_model_prequantized_checkpoint(tmp_path):
    """A pre-quantized checkpoint (compressed-tensors naming:
    weight_packed/weight_scale[/weight_global_scale]) loads through
    quantized_params_from_hf_state_dict and serves bitwise-identically
    to the directly-quantized params it was exported from."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.io import export_quantized_weight
    from qutlass_tpu.models.hf_loader import load_model
    from qutlass_tpu.models.transformer import quantize_model_weights

    from helpers import bf16_hadamard
    cfg = tiny_config()
    state = _fake_state(cfg)
    h = bf16_hadamard(32)
    params = params_from_hf_state_dict(cfg, state)
    direct = quantize_model_weights(cfg, params, h, fmt="nv",
                                    weight_format="both")

    # export every linear into the on-disk reference layout
    qstate = dict(state)
    ours_to_hf = {v: k for k, v in
                  {"self_attn.q_proj.weight": "q_proj",
                   "self_attn.k_proj.weight": "k_proj",
                   "self_attn.v_proj.weight": "v_proj",
                   "self_attn.o_proj.weight": "o_proj",
                   "mlp.gate_proj.weight": "gate_proj",
                   "mlp.up_proj.weight": "up_proj",
                   "mlp.down_proj.weight": "down_proj"}.items()}
    for i, layer in enumerate(direct["layers"]):
        for ours, hf_name in ours_to_hf.items():
            base = f"model.layers.{i}." + hf_name[: -len(".weight")]
            packed, scales, gs = export_quantized_weight(layer[ours])
            del qstate[base + ".weight"]
            qstate[base + ".weight_packed"] = np.asarray(packed)
            qstate[base + ".weight_scale"] = np.asarray(scales)
            qstate[base + ".weight_global_scale"] = np.asarray(
                gs, np.float32).reshape(1)
    safetensors.save_file(qstate, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
        "quantization_config": {"format": "nvfp4-pack-quantized"},
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    lcfg, qparams = load_model(str(tmp_path))
    lw = qparams["layers"][0]["q_proj"]
    assert {"nvi8", "nvsb", "gs"} <= set(lw), set(lw)
    np.testing.assert_array_equal(
        np.asarray(lw["nvi8"]),
        np.asarray(direct["layers"][0]["q_proj"]["nvi8"]))

    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out_loaded = forward(lcfg, qparams, toks, h, quantized=True)
    out_direct = forward(cfg, direct, toks, h, quantized=True)
    np.testing.assert_array_equal(np.asarray(out_loaded),
                                  np.asarray(out_direct))


def test_prequantized_scheme_detection():
    """_state_getters: NV keyed on global scale under either name
    (weight_global_scale / modelopt's weight_scale_2) or on group-16
    scale shape; group-16 without a global scale and non-uint8 packing
    raise descriptive errors."""
    from qutlass_tpu.io import export_quantized_weight
    from qutlass_tpu.models.hf_loader import _state_getters
    from qutlass_tpu.models.transformer import quantize_weight

    from helpers import bf16_hadamard
    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((64, 256)).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    h = bf16_hadamard(32)
    nv = quantize_weight(w, h=h, method="abs_max", fmt="nv",
                         weight_format="both")
    packed, scales, gs = export_quantized_weight(nv)

    # modelopt naming: weight_scale_2 is the second-level DEQUANT
    # multiplier = 1/gs (vLLM reciprocates it); input_scale likewise
    # maps to the static activation scale gsx = 1/input_scale
    state = {"w.weight_packed": np.asarray(packed),
             "w.weight_scale": np.asarray(scales),
             "w.weight_scale_2": np.asarray(1.0 / np.float32(gs),
                                            np.float32).reshape(1),
             "w.input_scale": np.asarray(0.25, np.float32).reshape(1)}
    _, get_q = _state_getters(state, "int8", jnp.bfloat16)
    d = get_q("w")
    assert {"nvi8", "nvsb", "gs", "gsx"} <= set(d)
    np.testing.assert_array_equal(np.asarray(d["nvi8"]),
                                  np.asarray(nv["nvi8"]))
    # double reciprocal is within 1 ulp of the original global scale
    np.testing.assert_allclose(np.float32(d["gs"]), np.float32(gs),
                               rtol=1.2e-7)
    assert np.float32(d["gsx"]) == np.float32(4.0)

    # group-16 scales but no global scale anywhere -> descriptive error
    del state["w.weight_scale_2"]
    _, get_q = _state_getters(state, "int8", jnp.bfloat16)
    with pytest.raises(KeyError, match="global scale"):
        get_q("w")

    # int32-packed (GPTQ-style) -> unsupported-scheme error
    state_bad = {"w.weight_packed": np.zeros((64, 128), np.int32),
                 "w.weight_scale": np.asarray(scales)}
    _, get_q = _state_getters(state_bad, "int8", jnp.bfloat16)
    with pytest.raises(NotImplementedError, match="uint8|GPTQ"):
        get_q("w")


def test_load_model_unsupported_quant_scheme(tmp_path):
    """A quantization_config for a non-fp4 scheme (e.g. GPTQ) raises a
    clear NotImplementedError instead of a confusing KeyError."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models.hf_loader import load_model

    cfg = tiny_config()
    state = _fake_state(cfg)
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "tie_word_embeddings": False,
        "quantization_config": {"quant_method": "gptq", "bits": 4},
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))
    with pytest.raises(NotImplementedError, match="gptq"):
        load_model(str(tmp_path))


def test_load_model_llama_style_tied(tmp_path):
    """Llama-style config (no qk_norm) with tied embeddings."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models.hf_loader import load_model
    from qutlass_tpu.models import tiny_config

    cfg = tiny_config(qk_norm=False, tie_embeddings=True)
    state = _fake_state(cfg)
    del state["lm_head.weight"]
    for i in range(cfg.num_layers):
        del state[f"model.layers.{i}.self_attn.q_norm.weight"]
        del state[f"model.layers.{i}.self_attn.k_norm.weight"]
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "llama",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "tie_word_embeddings": True,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    lcfg, params = load_model(str(tmp_path))
    assert not lcfg.qk_norm and lcfg.tie_embeddings
    assert "lm_head" not in params
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out = forward(lcfg, params, toks)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow
def test_load_model_mixtral(tmp_path):
    """Mixtral checkpoint: block_sparse_moe naming (gate router,
    experts.{e}.{w1,w3,w2}) maps onto the MoE tree; the gating math is
    already identical (softmax over top-k logits == softmax-then-
    renormalize over the picks).  Forward runs bf16 and quantized."""
    import json

    safetensors = pytest.importorskip("safetensors.numpy")
    from qutlass_tpu.models import moe
    from qutlass_tpu.models.hf_loader import load_model

    base = moe.tiny_moe_config()
    import dataclasses
    cfg = dataclasses.replace(base, qk_norm=False,
                              moe_intermediate=base.moe_intermediate)
    rng = np.random.default_rng(2)
    state = _fake_state(cfg)
    for i in range(cfg.num_layers):
        for k in ("gate_proj", "up_proj", "down_proj"):
            del state[f"model.layers.{i}.mlp.{k}.weight"]
        for k in list(state):
            if f"model.layers.{i}.self_attn.q_norm" in k or \
                    f"model.layers.{i}.self_attn.k_norm" in k:
                del state[k]
        p = f"model.layers.{i}.block_sparse_moe."
        state[p + "gate.weight"] = rng.standard_normal(
            (cfg.n_experts, cfg.hidden_size)).astype(np.float32) * 0.1
        for e in range(cfg.n_experts):
            ep = f"{p}experts.{e}."
            state[ep + "w1.weight"] = rng.standard_normal(
                (cfg.moe_intermediate, cfg.hidden_size)
            ).astype(np.float32) * 0.02
            state[ep + "w3.weight"] = rng.standard_normal(
                (cfg.moe_intermediate, cfg.hidden_size)
            ).astype(np.float32) * 0.02
            state[ep + "w2.weight"] = rng.standard_normal(
                (cfg.hidden_size, cfg.moe_intermediate)
            ).astype(np.float32) * 0.02
    safetensors.save_file(state, str(tmp_path / "model.safetensors"))
    hf_cfg = {
        "model_type": "mixtral",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.moe_intermediate,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": cfg.num_heads,
        "num_key_value_heads": cfg.num_kv_heads,
        "head_dim": cfg.head_dim,
        "rope_theta": cfg.rope_theta,
        "rms_norm_eps": cfg.rms_eps,
        "tie_word_embeddings": False,
        "num_local_experts": cfg.n_experts,
        "num_experts_per_tok": cfg.top_k,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_cfg))

    lcfg, params = load_model(str(tmp_path))
    assert lcfg.n_experts == cfg.n_experts and lcfg.top_k == cfg.top_k
    assert not lcfg.qk_norm
    assert lcfg.moe_intermediate == cfg.moe_intermediate
    assert params["layers"][0]["expert_up"].shape == (
        cfg.n_experts, cfg.moe_intermediate, cfg.hidden_size)
    toks = jax.random.randint(jax.random.PRNGKey(0), (1, 4), 0,
                              cfg.vocab_size)
    out = moe.forward(lcfg, params, toks)
    assert np.isfinite(np.asarray(out, np.float32)).all()

    from helpers import bf16_hadamard
    h = bf16_hadamard(32)
    qcfg, qparams = load_model(str(tmp_path), quantize=True, h=h)
    assert "wi8" in qparams["layers"][0]["expert_gate"][0] or \
        "wqt" in qparams["layers"][0]["expert_gate"][0]
    qout = moe.forward(qcfg, qparams, toks, h, quantized=True)
    assert np.isfinite(np.asarray(qout, np.float32)).all()
