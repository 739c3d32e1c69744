"""Serving harness tests: KV-cache decode must match the full forward."""
import pytest
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_sample_logits_controls():
    from qutlass_tpu.models import sample_logits
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0, 3.0]], jnp.float32)

    # temperature 0 -> greedy
    assert int(sample_logits(logits, key, temperature=0.0)[0]) == 1
    # top_k = 1 -> greedy regardless of key
    for s in range(5):
        k = jax.random.PRNGKey(s)
        assert int(sample_logits(logits, k, temperature=1.0, top_k=1)[0]) == 1
    # tiny top_p keeps only the argmax of a peaked distribution
    for s in range(5):
        k = jax.random.PRNGKey(s)
        assert int(sample_logits(logits, k, temperature=1.0,
                                 top_p=0.05)[0]) == 1
    # temperature sampling over near-uniform logits varies with the key
    u = jnp.zeros((1, 64), jnp.float32)
    draws = {int(sample_logits(u, jax.random.PRNGKey(s), temperature=1.0)[0])
             for s in range(16)}
    assert len(draws) > 4
    # top_k restricts the support
    lg = jnp.arange(64, dtype=jnp.float32)[None, :] * 0.1
    for s in range(16):
        tok = int(sample_logits(lg, jax.random.PRNGKey(s), temperature=5.0,
                                top_k=8)[0])
        assert tok >= 56


@pytest.mark.slow
def test_generate_sampled_and_eos_padding():
    cfg, params, h = _setup(True)
    prompt = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0,
                                cfg.vocab_size)
    steps = 8
    greedy = np.asarray(generate(cfg, params, prompt, h, steps=steps,
                                 max_len=16, quantized=True))
    # sampled generation is reproducible per key and differs across keys
    s1 = np.asarray(generate(cfg, params, prompt, h, steps=steps, max_len=16,
                             quantized=True, key=jax.random.PRNGKey(1),
                             temperature=1.0, top_k=0))
    s1b = np.asarray(generate(cfg, params, prompt, h, steps=steps, max_len=16,
                              quantized=True, key=jax.random.PRNGKey(1),
                              temperature=1.0, top_k=0))
    np.testing.assert_array_equal(s1, s1b)

    # eos padding: pick the token greedy emits at step 2 for row 0 as eos;
    # everything after its first occurrence must be pad_id
    eos = int(greedy[0, 2])
    out = np.asarray(generate(cfg, params, prompt, h, steps=steps, max_len=16,
                              quantized=True, eos_id=eos, pad_id=-1))
    for b in range(out.shape[0]):
        hits = np.nonzero(greedy[b] == eos)[0]
        if hits.size == 0:
            np.testing.assert_array_equal(out[b], greedy[b])
        else:
            j = int(hits[0])
            np.testing.assert_array_equal(out[b, : j + 1], greedy[b, : j + 1])
            assert (out[b, j + 1:] == -1).all()


def test_sample_logits_topk_topp_combined():
    from qutlass_tpu.models import sample_logits
    # top_k then top_p: support is the intersection
    lg = jnp.asarray([np.linspace(0, 6.3, 64)], jnp.float32)
    for s in range(8):
        tok = int(sample_logits(lg, jax.random.PRNGKey(s), temperature=1.0,
                                top_k=8, top_p=0.5)[0])
        assert tok >= 56   # inside top-8


@pytest.mark.slow
def test_ragged_generate_matches_per_row(on_tpu):
    """Ragged batch (right-padded + lengths) must produce, per row, the
    tokens of an unpadded single-row generate: every op is
    row-independent, so on a fixed reduction tiling the results are
    bit-equal.  On TPU, XLA tiles the attention reductions differently
    for different T, so ulp drift can flip borderline quantization
    codes — there we check the sampled-token distributions stay
    consistent instead of exact token equality."""
    cfg, params, h = _setup(True)
    rng = jax.random.PRNGKey(9)
    p_long = jax.random.randint(rng, (1, 6), 0, cfg.vocab_size)
    p_short = p_long[:, :3]
    steps = 5

    prompt = jnp.concatenate(
        [p_long, jnp.concatenate([p_short, jnp.zeros((1, 3), jnp.int32)],
                                 axis=1)], axis=0)     # [2, 6] right-padded
    lengths = jnp.asarray([6, 3], jnp.int32)
    ragged = np.asarray(generate(cfg, params, prompt, h, steps=steps,
                                 max_len=16, quantized=True,
                                 lengths=lengths))

    for row, pr in ((0, p_long), (1, p_short)):
        solo = np.asarray(generate(cfg, params, pr, h, steps=steps,
                                   max_len=16, quantized=True))
        if on_tpu:
            # reduction-tiling ulp drift: require only that the first
            # greedy token agrees (one forward, least accumulation)
            assert ragged[row][0] == solo[0][0], (row, ragged[row], solo[0])
        else:
            np.testing.assert_array_equal(ragged[row], solo[0])


def test_ragged_prefill_logits_match(on_tpu):
    cfg, params, h = _setup(False)
    toks = jax.random.randint(jax.random.PRNGKey(4), (1, 5), 0,
                              cfg.vocab_size)
    padded = jnp.concatenate([toks, jnp.zeros((1, 3), jnp.int32)], axis=1)
    lg_r, _ = prefill(cfg, params, padded, h, max_len=16,
                      lengths=jnp.asarray([5], jnp.int32))
    lg_d, _ = prefill(cfg, params, toks, h, max_len=16)
    if on_tpu:    # shape-dependent reduction tiling -> ulp drift
        np.testing.assert_allclose(np.asarray(lg_r), np.asarray(lg_d),
                                   rtol=5e-2, atol=5e-2)
    else:
        np.testing.assert_array_equal(np.asarray(lg_r), np.asarray(lg_d))


@pytest.mark.slow
def test_prefill_chunked_matches_full(on_tpu):
    """Chunked prefill == one-shot prefill: bitwise on CPU (logits and
    the cache's valid positions; the padded tail past T holds garbage
    the decode path overwrites before it becomes visible — same
    contract as ragged prefill).  On TPU the two are different fusion
    contexts (chunk-wide vs T-wide programs), so the comparison is
    tolerance-based like the ragged-prefill test."""
    import pytest
    from qutlass_tpu.models.serving import prefill_chunked

    for quantized in (False, True):
        cfg, p, h = _setup(quantized)
        toks = jax.random.randint(jax.random.PRNGKey(9), (2, 11), 0,
                                  cfg.vocab_size)
        ref_logits, ref_cache = prefill(cfg, p, toks, h, max_len=24,
                                        quantized=quantized)
        for chunk in (4, 8, 11, 16):
            logits, cache = prefill_chunked(cfg, p, toks, h, max_len=24,
                                            chunk=chunk, quantized=quantized)
            if on_tpu:    # shape-dependent fusion/tiling -> ulp drift
                np.testing.assert_allclose(
                    np.asarray(logits, np.float32),
                    np.asarray(ref_logits, np.float32),
                    rtol=5e-2, atol=5e-2, err_msg=f"chunk={chunk}")
                continue
            np.testing.assert_array_equal(np.asarray(logits),
                                          np.asarray(ref_logits),
                                          err_msg=f"chunk={chunk}")
            for l in range(cfg.num_layers):
                for kv in ("k", "v"):
                    np.testing.assert_array_equal(
                        np.asarray(cache[l][kv][:, :11]),
                        np.asarray(ref_cache[l][kv][:, :11]),
                        err_msg=f"q={quantized} chunk={chunk} l{l} {kv}")


def test_prefill_chunked_ragged():
    """Ragged chunked prefill reads each row's logits at lengths-1."""
    from qutlass_tpu.models.serving import prefill_chunked

    cfg, params, h = _setup(False)
    toks = jax.random.randint(jax.random.PRNGKey(10), (3, 10), 0,
                              cfg.vocab_size)
    lengths = jnp.asarray([3, 10, 6], jnp.int32)
    ref_logits, _ = prefill(cfg, params, toks, h, max_len=16,
                            lengths=lengths)
    logits, _ = prefill_chunked(cfg, params, toks, h, max_len=16, chunk=4,
                                lengths=lengths)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(ref_logits))


def test_prefill_chunked_validates():
    import pytest
    from qutlass_tpu.models.serving import prefill_chunked

    cfg, params, h = _setup(False)
    toks = jnp.zeros((1, 10), jnp.int32)
    with pytest.raises(ValueError, match="max_len"):
        prefill_chunked(cfg, params, toks, h, max_len=10, chunk=4)
    with pytest.raises(ValueError, match="lengths"):
        prefill_chunked(cfg, params, toks, h, max_len=16, chunk=4,
                        lengths=jnp.asarray([0]))


def test_int8_kv_cache_roundtrip_bound():
    """KV int8 quantization: |dequant - x| <= rowmax/254 per element
    (symmetric per-(position, head) scales)."""
    from qutlass_tpu.models.serving import _kv_dequantize, _kv_quantize

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 7, 3, 64)) * 5, jnp.bfloat16)
    q, s = _kv_quantize(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 7, 3)
    deq = np.asarray(_kv_dequantize(q, s))
    xf = np.asarray(x, np.float32)
    bound = np.abs(xf).max(axis=-1, keepdims=True) / 254 * (1 + 1e-6)
    assert (np.abs(deq - xf) <= bound).all()


@pytest.mark.slow
def test_int8_kv_cache_generation_quality():
    """generate with cache_format='int8' stays at quality: per-step
    teacher-forced decode logits cosine > 0.99 vs the bf16 cache."""
    cfg, params, h = _setup(False)
    toks = jax.random.randint(jax.random.PRNGKey(15), (2, 6), 0,
                              cfg.vocab_size)
    lb, cb = prefill(cfg, params, toks[:, :4], h, max_len=12)
    li, ci = prefill(cfg, params, toks[:, :4], h, max_len=12,
                     cache_format="int8")
    assert ci[0]["k"].dtype == jnp.int8

    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)

    assert cos(lb, li) > 0.99, cos(lb, li)
    for p in range(4, 6):
        lb, cb = decode_step(cfg, params, cb, toks[:, p], jnp.int32(p), h)
        li, ci = decode_step(cfg, params, ci, toks[:, p], jnp.int32(p), h)
        assert cos(lb, li) > 0.99, (p, cos(lb, li))

    # full generate runs end-to-end on the int8 cache
    out = generate(cfg, params, toks, h, steps=4, max_len=16,
                   cache_format="int8")
    assert out.shape == (2, 4)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_generate_logprobs():
    """return_logprobs: each emitted token's log-prob under the model's
    softmax at the producing position; greedy tokens carry the max
    log-prob; post-EOS padding carries 0.0; tokens unchanged."""
    cfg, params, h = _setup(False)
    prompt = jax.random.randint(jax.random.PRNGKey(6), (2, 5), 0,
                                cfg.vocab_size)
    steps = 5
    plain = np.asarray(generate(cfg, params, prompt, h, steps=steps,
                                max_len=16))
    toks, lps = generate(cfg, params, prompt, h, steps=steps, max_len=16,
                         return_logprobs=True)
    toks, lps = np.asarray(toks), np.asarray(lps, np.float32)
    np.testing.assert_array_equal(toks, plain)
    assert lps.shape == (2, steps) and (lps <= 0).all()

    # verify the first step's logprob against a manual prefill
    logits, _ = prefill(cfg, params, prompt, h, max_len=16)
    ref = np.log(np.exp(np.asarray(logits, np.float64))
                 / np.exp(np.asarray(logits, np.float64)).sum(-1,
                                                              keepdims=True))
    np.testing.assert_allclose(lps[:, 0], ref[np.arange(2), toks[:, 0]],
                               rtol=1e-5, atol=1e-5)
    # greedy: the emitted token is the argmax -> max logprob
    assert (toks[:, 0] == np.argmax(np.asarray(logits), -1)).all()

    # EOS padding zeroes the tail logprobs
    eos = int(plain[0, 1])
    toks2, lps2 = generate(cfg, params, prompt, h, steps=steps, max_len=16,
                           eos_id=eos, pad_id=-1, return_logprobs=True)
    toks2, lps2 = np.asarray(toks2), np.asarray(lps2)
    for b in range(2):
        hits = np.nonzero(toks2[b] == -1)[0]
        if hits.size:
            assert (lps2[b, hits] == 0.0).all()


def test_sliding_window_composes_with_chunked_and_int8_cache():
    """Feature composition: a sliding-window config through chunked
    prefill equals its one-shot prefill bitwise (the window mask is
    position-absolute, so chunking cannot change it), and the int8
    cache runs under the window."""
    import dataclasses
    from qutlass_tpu.models.serving import prefill_chunked

    cfg, params, h = _setup(False)
    win = dataclasses.replace(cfg, sliding_window=5)
    toks = jax.random.randint(jax.random.PRNGKey(17), (2, 11), 0,
                              cfg.vocab_size)
    ref, _ = prefill(win, params, toks, h, max_len=24)
    got, _ = prefill_chunked(win, params, toks, h, max_len=24, chunk=4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    li, ci = prefill(win, params, toks, h, max_len=24, cache_format="int8")
    assert ci[0]["k"].dtype == jnp.int8
    lb, _ = prefill(win, params, toks, h, max_len=24)
    a = np.asarray(li, np.float32).ravel()
    b = np.asarray(lb, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.99, cos


@pytest.mark.slow
def test_generate_dispatch_loop_matches_scan():
    """The TPU-default dispatch loop (serving._generate_dispatch) and
    the joint-scan _generate implement the same semantics and key
    schedule: same tokens and logprobs, greedy and sampled+EOS."""
    import qutlass_tpu.models.serving as S
    cfg, params, h = _setup(True)
    prompt = jax.random.randint(jax.random.PRNGKey(9), (2, 6), 0,
                                cfg.vocab_size)
    for kw in ({"temperature": 0.0},
               {"temperature": 0.8, "top_k": 16, "key": jax.random.PRNGKey(4),
                "eos_id": 3, "pad_id": 0}):
        scan = S._generate(cfg, params, prompt, h, steps=6, max_len=16,
                           quantized=True, return_logprobs=True, **kw)
        disp = S._generate_dispatch(cfg, params, prompt, h, steps=6,
                                    max_len=16, quantized=True,
                                    return_logprobs=True, **kw)
        np.testing.assert_array_equal(np.asarray(scan[0]),
                                      np.asarray(disp[0]))
        np.testing.assert_allclose(np.asarray(scan[1]), np.asarray(disp[1]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_generate_dispatch_ragged():
    import qutlass_tpu.models.serving as S
    cfg, params, h = _setup(True)
    prompt = jax.random.randint(jax.random.PRNGKey(11), (3, 8), 0,
                                cfg.vocab_size)
    lengths = jnp.asarray([3, 8, 5], jnp.int32)
    scan = S._generate(cfg, params, prompt, h, steps=4, max_len=16,
                       quantized=True, lengths=lengths)
    disp = S._generate_dispatch(cfg, params, prompt, h, steps=4,
                                max_len=16, quantized=True, lengths=lengths)
    np.testing.assert_array_equal(np.asarray(scan), np.asarray(disp))
