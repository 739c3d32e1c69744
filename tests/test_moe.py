"""MoE model family tests (tiny config, CPU emulation)."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from qutlass_tpu.models import moe, tiny_moe_config
from helpers import bf16_hadamard


def test_topk_dispatch_invariants():
    rng = np.random.default_rng(0)
    m, e, k, cap = 64, 4, 2, 48
    logits = jnp.asarray(rng.standard_normal((m, e)), jnp.float32)
    dispatch, gates = moe.topk_dispatch(logits, k, cap)
    d = np.asarray(dispatch)
    # each token occupies at most k buffer slots, each slot once
    assert d.sum() <= m * k + 1e-6
    assert np.all(d.reshape(m, -1).sum(-1) <= k + 1e-6)
    slot_use = d.sum(axis=0)          # [E, cap] — at most one token/slot
    assert np.all(slot_use <= 1 + 1e-6)
    g = np.asarray(gates)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-5)
    assert np.all((g > 0).sum(-1) <= k)


def test_moe_forward_and_quantized():
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0,
                              cfg.vocab_size)

    out = moe.forward(cfg, params, toks, h)
    assert out.shape == (2, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(out)).all()

    qparams = moe.quantize_model_weights(cfg, params, h)
    outq = moe.forward(cfg, qparams, toks, h, quantized=True)
    assert np.isfinite(np.asarray(outq)).all()
    # random-init tiny models are the worst case for W4A4 (no outlier
    # structure, 2 stacked quantized layers); same bar as test_models
    a = np.asarray(out, np.float32).ravel()
    b = np.asarray(outq, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.6, cos


@pytest.mark.slow
def test_moe_cached_decode_matches_forward():
    from qutlass_tpu.models import moe
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                              cfg.vocab_size)
    # capacity is not exceeded at these token counts, so joint (prefill)
    # and stepwise (decode) routing agree
    full = moe.forward(cfg, params, toks, h)
    logits, cache = moe.prefill(cfg, params, toks[:, :4], h, max_len=8)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, 3]),
                               rtol=5e-2, atol=5e-2)
    for p in range(4, 8):
        logits, cache = moe.decode_step(cfg, params, cache, toks[:, p],
                                        jnp.int32(p), h)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, p]),
                                   rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_moe_generate_quantized():
    from qutlass_tpu.models import moe
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    qparams = moe.quantize_model_weights(cfg, params, h)
    prompt = jax.random.randint(jax.random.PRNGKey(2), (2, 4), 0,
                                cfg.vocab_size)
    toks = moe.generate(cfg, qparams, prompt, h, steps=4, max_len=8,
                        quantized=True, key=jax.random.PRNGKey(3),
                        temperature=0.7, top_k=8)
    assert np.asarray(toks).shape == (2, 4)
    t2 = moe.generate(cfg, qparams, prompt, h, steps=4, max_len=8,
                      quantized=True, key=jax.random.PRNGKey(3),
                      temperature=0.7, top_k=8)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(t2))


@pytest.mark.slow
def test_moe_nvfp4_quantized_forward():
    """MoE with fmt="nv": both evaluator formats finite and at quality
    parity with each other vs the bf16 model (same contract as the
    dense NV test — bounded int8 rounding triggers the composite-jit
    divergence, so path-vs-path closeness is not the bar)."""
    cfg = tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                              cfg.vocab_size)
    ref = np.asarray(moe.forward(cfg, params, toks, h), np.float32).ravel()

    def cos(u, v):
        return float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-9))

    outs = {}
    for wf in ("fp4", "int8"):
        qp = moe.quantize_model_weights(cfg, params, h, fmt="nv",
                                        weight_format=wf)
        o = np.asarray(moe.forward(cfg, qp, toks, h, quantized=True),
                       np.float32).ravel()
        assert np.isfinite(o).all()
        outs[wf] = o
    assert any("nvi8" in l["expert_gate"][0] for l in
               moe.quantize_model_weights(cfg, params, h, fmt="nv")["layers"])
    assert cos(outs["int8"], ref) > cos(outs["fp4"], ref) - 0.05, \
        (cos(outs["int8"], ref), cos(outs["fp4"], ref))


def test_mixed_int8_fallback_demotes_stack():
    """An expert whose row-exponent spread trips the MX int8-exactness
    fallback must demote its whole stack to fp4 (format-uniform lists
    are required by moe_tp.stack_experts / EP sharding)."""
    import jax
    import jax.numpy as jnp
    from qutlass_tpu.models import moe
    from qutlass_tpu.models.moe_tp import stack_experts
    from helpers import bf16_hadamard

    cfg = moe.tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(5))
    h = bf16_hadamard(32)
    # expert 1's gate weight: per-32-group magnitudes spanning ~40
    # binades (the rotation mixes only within groups, so group scales
    # stay wildly separated -> dmax > 3 -> fp4 fallback)
    w = np.asarray(params["layers"][0]["expert_gate"],
                   np.float32)
    bad = w[1].copy()
    bad[:, :32] *= 2.0 ** -40
    w[1] = bad
    params["layers"][0]["expert_gate"] = jnp.asarray(w, jnp.bfloat16)

    qp = moe.quantize_model_weights(cfg, params, h, weight_format="int8")
    stack = qp["layers"][0]["expert_gate"]
    keysets = [set(d) for d in stack]
    assert all(ks == keysets[0] for ks in keysets), keysets
    assert "wqt" in keysets[0] and "wi8" not in keysets[0], keysets[0]
    # other layers / stacks keep int8 where uniformly exact
    assert any("wi8" in d for d in qp["layers"][1]["expert_gate"])
    stacked = stack_experts(cfg, qp)     # must not raise
    assert stacked["layers"][0]["expert_gate"]["wqt"].shape[0] == \
        cfg.n_experts

    # stack_experts raises descriptively on a hand-built mixed stack
    import pytest as _pytest
    broken = {**qp, "layers": [dict(qp["layers"][0])] + qp["layers"][1:]}
    broken["layers"][0] = dict(broken["layers"][0])
    broken["layers"][0]["expert_up"] = (
        [qp["layers"][1]["expert_gate"][0]] +
        list(qp["layers"][0]["expert_gate"][1:]))
    with _pytest.raises(ValueError, match="heterogeneous"):
        stack_experts(cfg, broken)
