"""Serving harness tests: KV-cache decode must match the full forward."""
import numpy as np
import jax
import jax.numpy as jnp

from qutlass_tpu.models import (forward, generate, init_params, prefill,
                                decode_step, quantize_model_weights,
                                tiny_config)
from helpers import bf16_hadamard


def _setup(quantized):
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    if quantized:
        params = quantize_model_weights(cfg, params, h)
    return cfg, params, h


def test_cached_decode_matches_forward_bf16():
    cfg, params, h = _setup(False)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0,
                              cfg.vocab_size)
    full = forward(cfg, params, toks, h)               # [B, T, V]

    logits, cache = prefill(cfg, params, toks[:, :8], h, max_len=16)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, 7]), rtol=5e-2, atol=5e-2)
    # continue decoding positions 8..11 with the real next tokens
    for p in range(8, 12):
        logits, cache = decode_step(cfg, params, cache, toks[:, p],
                                    jnp.int32(p), h)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, p]),
                                   rtol=5e-2, atol=5e-2)


def test_cached_decode_matches_forward_quantized():
    cfg, params, h = _setup(True)
    toks = jax.random.randint(jax.random.PRNGKey(2), (1, 8), 0,
                              cfg.vocab_size)
    full = forward(cfg, params, toks, h, quantized=True)

    logits, cache = prefill(cfg, params, toks[:, :4], h, max_len=8,
                            quantized=True)
    for p in range(4, 8):
        logits, cache = decode_step(cfg, params, cache, toks[:, p],
                                    jnp.int32(p), h, quantized=True)
        # quantization amplifies tiny batched-vs-stepwise fp differences
        # into code flips (on TPU especially) — compare directionally
        a = np.asarray(logits, np.float32).ravel()
        b = np.asarray(full[:, p], np.float32).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        assert cos > 0.95, (p, cos)


def test_generate_greedy_consistency():
    cfg, params, h = _setup(True)
    prompt = jax.random.randint(jax.random.PRNGKey(3), (2, 6), 0,
                                cfg.vocab_size)
    steps = 4
    out = generate(cfg, params, prompt, h, steps=steps, max_len=16,
                   quantized=True)
    assert out.shape == (2, steps)
    # manual replay: same tokens step by step
    logits, cache = prefill(cfg, params, prompt, h, max_len=16,
                            quantized=True)
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    got = [tok]
    pos = prompt.shape[1]
    for i in range(steps - 1):
        logits, cache = decode_step(cfg, params, cache, tok,
                                    jnp.int32(pos + i), h, quantized=True)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        got.append(tok)
    manual = jnp.stack(got, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(manual))
