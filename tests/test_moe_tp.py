"""Expert-parallel MoE serving tests on the CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qutlass_tpu.models import moe, moe_tp, tiny_moe_config
from qutlass_tpu.parallel.sharding import make_mesh
from helpers import bf16_hadamard


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    qparams = moe.quantize_model_weights(cfg, params, h)
    return cfg, params, qparams, h


@pytest.mark.slow
def test_moe_tp_prefill_matches_single_device(setup):
    cfg, params, qparams, h = setup
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    mesh = make_mesh({"tp": 2})
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0,
                              cfg.vocab_size)

    # bf16 path: tight (only psum/summation-order drift)
    bp = moe_tp.shard_params(cfg, params, mesh, quantized=False)
    ref_logits, ref_cache = moe.prefill(cfg, params, toks, h, max_len=8)
    tpl, tpc = moe_tp.tp_prefill(cfg, bp, toks, h, mesh, max_len=8,
                                 quantized=False)
    np.testing.assert_allclose(np.asarray(tpl, np.float32),
                               np.asarray(ref_logits, np.float32),
                               rtol=2e-2, atol=3e-2)
    for l in range(cfg.num_layers):
        np.testing.assert_allclose(
            np.asarray(tpc[l]["k"], np.float32),
            np.asarray(ref_cache[l]["k"], np.float32), rtol=2e-2, atol=3e-2)

    # quantized path: directional (bf16 partial rounding flips codes)
    sp = moe_tp.shard_params(cfg, qparams, mesh)
    ref_logits, _ = moe.prefill(cfg, qparams, toks, h, max_len=8,
                                quantized=True)
    tpl, _ = moe_tp.tp_prefill(cfg, sp, toks, h, mesh, max_len=8)
    a = np.asarray(tpl, np.float32).ravel()
    b = np.asarray(ref_logits, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.95, cos


@pytest.mark.slow
def test_moe_tp_generate_consistency(setup):
    """tp_generate == manual tp prefill + decode loop (greedy)."""
    cfg, params, qparams, h = setup
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    mesh = make_mesh({"tp": 2})
    sp = moe_tp.shard_params(cfg, qparams, mesh)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (1, 4), 0,
                                cfg.vocab_size)
    steps = 4
    toks = np.asarray(moe_tp.tp_generate(cfg, sp, prompt, h, mesh,
                                         steps=steps, max_len=16))
    logits, cache = moe_tp.tp_prefill(cfg, sp, prompt, h, mesh, max_len=16)
    cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    got, pos = [], 4
    for _ in range(steps):
        got.append(np.asarray(cur))
        logits, cache = moe_tp.tp_decode_step(cfg, sp, cache, cur,
                                              jnp.int32(pos), h, mesh)
        cur = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos += 1
    np.testing.assert_array_equal(toks, np.stack(got, axis=1))


@pytest.mark.slow
def test_moe_tp_prefill_nvfp4_int8():
    """NV int8 experts through EP serving: each expert lives whole on
    one shard (expert-axis sharding), so the NV evaluator's per-row
    scales need no cross-shard treatment; cosine-level vs single
    device (same bar as the quantized MX EP test)."""
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    qparams = moe.quantize_model_weights(cfg, params, h, fmt="nv",
                                         weight_format="int8")
    assert all("nvi8" in l["expert_gate"][0] for l in qparams["layers"])
    mesh = make_mesh({"tp": 2})
    sp = moe_tp.shard_params(cfg, qparams, mesh)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 6), 0,
                              cfg.vocab_size)
    ref, _ = moe.prefill(cfg, qparams, toks, h, max_len=8, quantized=True)
    tpl, _ = moe_tp.tp_prefill(cfg, sp, toks, h, mesh, max_len=8)
    a = np.asarray(tpl, np.float32).ravel()
    b = np.asarray(ref, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.95, cos
