"""Continuous batching: streamed prompts through a fixed slot pool must
reproduce solo generation bit-for-bit (greedy, CPU) — VERDICT r1 #9."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qutlass_tpu.models import (ModelConfig, generate, init_params,
                                quantize_model_weights, tiny_config)
from qutlass_tpu.models.continuous import ContinuousBatcher
from helpers import bf16_hadamard


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    qparams = quantize_model_weights(cfg, params, h)
    return cfg, params, qparams, h


def _solo(cfg, params, h, ids, steps, quantized, eos_id=None):
    prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
    toks = np.asarray(generate(cfg, params, prompt, h, steps=steps,
                               max_len=64, quantized=quantized,
                               eos_id=eos_id, pad_id=-1))[0]
    if eos_id is not None:
        keep = []
        for t in toks:
            if t == -1:
                break
            keep.append(t)
            if t == eos_id:
                break
        return np.asarray(keep, np.int32)
    return toks


@pytest.mark.slow
@pytest.mark.parametrize("quantized", [False, True])
def test_stream_matches_solo(setup, quantized):
    cfg, params, qparams, h = setup
    p = qparams if quantized else params
    rng = np.random.default_rng(0)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 5)
               for _ in range(7)]
    cb = ContinuousBatcher(cfg, p, h, n_slots=3, max_len=64,
                           quantized=quantized)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, p, h, ids, steps, quantized)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_stream_eos_frees_slots(setup):
    """EOS eviction: finished rows free mid-stream and later prompts
    still match solo generation."""
    cfg, params, _, h = setup
    rng = np.random.default_rng(1)
    # find an eos_id that actually occurs early for some prompt: use the
    # model's own greedy output as the eos target for prompt 0
    ids0 = rng.integers(0, cfg.vocab_size, 5)
    first = _solo(cfg, params, h, ids0, 3, False)
    eos = int(first[1])
    prompts = [(ids0, 8)] + [
        (rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 6)
        for _ in range(4)]
    cb = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=64)
    outs = cb.run(prompts, eos_id=eos)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, params, h, ids, steps, False, eos_id=eos)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


def test_rejects_oversized_prompt(setup):
    cfg, params, _, h = setup
    cb = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=16)
    with pytest.raises(ValueError, match="exceeds max_len"):
        cb.run([(np.arange(12), 8)])


@pytest.mark.slow
def test_stream_matches_solo_moe():
    """MoE continuous batching (mlp hook): streamed prompts == solo
    moe.generate bitwise on CPU (routing is per-row; capacity never
    drops because per-expert occupancy <= m <= cap)."""
    from qutlass_tpu.models import moe

    cfg = moe.tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(2))
    h = bf16_hadamard(32)
    qparams = moe.quantize_model_weights(cfg, params, h)
    rng = np.random.default_rng(3)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 4)
               for _ in range(4)]
    cb = ContinuousBatcher(cfg, qparams, h, n_slots=2, max_len=64,
                           quantized=True, mlp=moe._moe_mlp_block)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
        ref = np.asarray(moe.generate(cfg, qparams, prompt, h, steps=steps,
                                      max_len=64, quantized=True,
                                      pad_id=-1))[0]
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"moe prompt {i} diverged")


@pytest.mark.slow
def test_bucket_clamped_to_max_len(setup):
    """A prompt whose padding bucket exceeds max_len must still admit
    (the prefill block is clamped to the cache length)."""
    cfg, params, _, h = setup
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size, 40)      # _bucket(40) = 64
    cb = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=50,
                           quantized=False)
    outs = cb.run([(ids, 8)])
    prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
    from qutlass_tpu.models import generate as _gen
    ref = np.asarray(_gen(cfg, params, prompt, h, steps=8, max_len=50,
                          quantized=False, pad_id=-1))[0]
    np.testing.assert_array_equal(outs[0], ref)


@pytest.mark.slow
def test_stream_tp_engine_matches_solo(setup):
    """TP continuous batching (TPEngine over the CPU mesh): streamed
    prompts through the sharded fixed-slot pool equal solo SINGLE-DEVICE
    generation exactly (greedy; the TP fp32-partial psum contract of
    test_serving_tp holds for every dispatch the batcher makes)."""
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    from qutlass_tpu.models import serving_tp as TP
    from qutlass_tpu.parallel.sharding import make_mesh

    cfg, params, qparams, h = setup
    mesh = make_mesh({"tp": 2})
    sp = TP.shard_params(cfg, qparams, mesh)
    engine = TP.TPEngine(cfg, sp, h, mesh, quantized=True)
    rng = np.random.default_rng(5)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 5)
               for _ in range(5)]
    cb = ContinuousBatcher(n_slots=2, max_len=64, engine=engine)
    # the slot cache is actually sharded over heads
    shd = cb.cache[0]["k"].sharding
    assert "tp" in getattr(shd, "spec", ())[2], shd
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, qparams, h, ids, steps, True)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_stream_moe_ep_engine_matches_solo():
    """MoE continuous batching over the expert-parallel mesh
    (moe_tp.engine): streamed prompts equal solo single-device
    moe.generate exactly (greedy; fp32 expert partials cross the psum
    unrounded, same contract as the dense TP engine)."""
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    from qutlass_tpu.models import moe, moe_tp
    from qutlass_tpu.parallel.sharding import make_mesh

    cfg = moe.tiny_moe_config()
    params = moe.init_params(cfg, jax.random.PRNGKey(6))
    h = bf16_hadamard(32)
    qparams = moe.quantize_model_weights(cfg, params, h)
    mesh = make_mesh({"tp": 2})
    sp = moe_tp.shard_params(cfg, qparams, mesh)
    eng = moe_tp.engine(cfg, sp, h, mesh, quantized=True)
    rng = np.random.default_rng(7)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 4)
               for _ in range(4)]
    cb = ContinuousBatcher(n_slots=2, max_len=64, engine=eng)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
        ref = np.asarray(moe.generate(cfg, qparams, prompt, h, steps=steps,
                                      max_len=64, quantized=True,
                                      pad_id=-1))[0]
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"moe prompt {i} diverged")


@pytest.mark.slow
@pytest.mark.parametrize("quantized", [False, True])
def test_stream_chunked_admission_matches_solo(setup, quantized):
    """chunk=8 admission (one compiled prefill program for all prompt
    lengths) reproduces solo generation bitwise, like the bucket
    ladder."""
    cfg, params, qparams, h = setup
    p = qparams if quantized else params
    rng = np.random.default_rng(8)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 20)), 5)
               for _ in range(5)]
    cb = ContinuousBatcher(cfg, p, h, n_slots=2, max_len=64,
                           quantized=quantized, chunk=8)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, p, h, ids, steps, quantized)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_stream_tp_engine_chunked_matches_solo(setup):
    """TP engine with chunked admission (tp_prefill_step): identical
    outputs to solo single-device generation, with one chunk-wide
    compiled TP prefill program instead of the bucket ladder."""
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    from qutlass_tpu.models import serving_tp as TP
    from qutlass_tpu.parallel.sharding import make_mesh

    cfg, params, qparams, h = setup
    mesh = make_mesh({"tp": 2})
    sp = TP.shard_params(cfg, qparams, mesh)
    eng = TP.TPEngine(cfg, sp, h, mesh, quantized=True, chunk=8)
    rng = np.random.default_rng(9)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 20)), 4)
               for _ in range(4)]
    cb = ContinuousBatcher(n_slots=2, max_len=64, engine=eng)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, qparams, h, ids, steps, True)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [None, 4])
def test_prefix_cache_matches_solo(setup, chunk):
    """Prefix caching: prompts sharing a registered prefix reuse its KV
    rows and only prefill their suffix — outputs equal solo generation
    of the FULL prompt bitwise; non-matching prompts and the
    prefix==prompt edge take their own paths and match too."""
    cfg, params, qparams, h = setup
    rng = np.random.default_rng(11)
    prefix = rng.integers(0, cfg.vocab_size, 9)
    prompts = [
        (np.concatenate([prefix, rng.integers(0, cfg.vocab_size, 5)]), 5),
        (np.concatenate([prefix, rng.integers(0, cfg.vocab_size, 1)]), 4),
        (prefix.copy(), 4),                                # prefix == prompt
        (rng.integers(0, cfg.vocab_size, 6), 5),           # no prefix match
        (np.concatenate([prefix, rng.integers(0, cfg.vocab_size, 11)]), 3),
    ]
    cb = ContinuousBatcher(cfg, qparams, h, n_slots=2, max_len=64,
                           quantized=True, chunk=chunk)
    cb.set_prefix(prefix)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, qparams, h, ids, steps, True)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_prefix_cache_tp_engine(setup):
    """Prefix caching through the TP engine: sharded prefix rows splice
    + suffix continuation, tokens equal solo single-device output."""
    if jax.device_count() < 2:
        pytest.skip("needs a 2-device mesh")
    from qutlass_tpu.models import serving_tp as TP
    from qutlass_tpu.parallel.sharding import make_mesh

    cfg, params, qparams, h = setup
    mesh = make_mesh({"tp": 2})
    sp = TP.shard_params(cfg, qparams, mesh)
    eng = TP.TPEngine(cfg, sp, h, mesh, quantized=True)
    rng = np.random.default_rng(13)
    prefix = rng.integers(0, cfg.vocab_size, 8)
    prompts = [
        (np.concatenate([prefix, rng.integers(0, cfg.vocab_size, 4)]), 4),
        (rng.integers(0, cfg.vocab_size, 5), 4),
    ]
    cb = ContinuousBatcher(n_slots=2, max_len=64, engine=eng)
    cb.set_prefix(prefix)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, qparams, h, ids, steps, True)
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_stream_int8_cache_matches_solo_int8(setup):
    """Scheduler invariance holds per cache format: streamed prompts
    with cache_format='int8' equal solo generate(cache_format='int8')
    bitwise (the scheduler changes WHEN rows compute, never WHAT)."""
    from qutlass_tpu.models import generate

    cfg, params, qparams, h = setup
    rng = np.random.default_rng(16)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 9)), 5)
               for _ in range(4)]
    cb = ContinuousBatcher(cfg, qparams, h, n_slots=2, max_len=64,
                           quantized=True, cache_format="int8")
    assert cb.cache[0]["k"].dtype == jnp.int8
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
        ref = np.asarray(generate(cfg, qparams, prompt, h, steps=steps,
                                  max_len=64, quantized=True, pad_id=-1,
                                  cache_format="int8"))[0]
        np.testing.assert_array_equal(outs[i], ref,
                                      err_msg=f"prompt {i} diverged")


@pytest.mark.slow
def test_admit_batch_mode_margin_contract(setup):
    """admit_batch=True prefills all of a round's admissions as one
    ragged dispatch.  The batch-shaped logits dot rounds differently at
    the fp32 ulp level than solo, so greedy tokens may flip ONLY where
    the decision margin is ulp-thin: every divergence from solo must be
    justified by a sub-1e-4 top-2 margin at the divergence point."""
    from qutlass_tpu.models import decode_step, prefill

    cfg, params, qparams, h = setup
    rng = np.random.default_rng(23)
    prompts = [(rng.integers(0, cfg.vocab_size, rng.integers(3, 17)), 5)
               for _ in range(6)]
    cb = ContinuousBatcher(cfg, qparams, h, n_slots=3, max_len=64,
                           quantized=True, admit_batch=True)
    outs = cb.run(prompts)
    for i, (ids, steps) in enumerate(prompts):
        ref = _solo(cfg, qparams, h, ids, steps, True)
        got = outs[i]
        if np.array_equal(got, ref):
            continue
        j = int(np.argwhere(got != ref)[0])
        # replay solo to the divergence point and check its margin
        prompt = jnp.asarray(np.asarray(ids, np.int32)[None])
        logits, cache = prefill(cfg, qparams, prompt, h, max_len=64,
                                quantized=True)
        pos = len(ids)
        for k in range(j):
            logits, cache = decode_step(cfg, qparams, cache,
                                        jnp.asarray([ref[k]], jnp.int32),
                                        jnp.int32(pos + k), h,
                                        quantized=True)
        top2 = np.sort(np.asarray(logits, np.float32).ravel())[-2:]
        margin = float(top2[1] - top2[0])
        assert margin < 1e-4, (
            f"prompt {i} diverged at step {j} with margin {margin:.3e} "
            "— not explainable by batch-shape ulp rounding")


@pytest.mark.slow
def test_run_metrics(setup):
    """run() records dispatch/throughput counters: batched admission
    collapses a round's prefills into one dispatch, prefix hits are
    counted, occupancy is a [0, 1] fraction."""
    cfg, params, qparams, h = setup
    rng = np.random.default_rng(24)
    prompts = [(rng.integers(0, cfg.vocab_size, 5), 3) for _ in range(4)]

    cb = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=32)
    cb.run(prompts)
    m1 = cb.metrics
    assert m1["prefill_dispatches"] == 4          # per-prompt (default)
    assert m1["tokens_out"] == 12
    assert 0 < m1["mean_occupancy"] <= 1
    assert m1["tokens_per_s"] > 0

    cbb = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=32,
                            admit_batch=True)
    cbb.run(prompts)
    assert cbb.metrics["prefill_dispatches"] < 4  # rounds batched

    cbp = ContinuousBatcher(cfg, params, h, n_slots=2, max_len=32)
    cbp.set_prefix(prompts[0][0][:3])
    cbp.run([(np.concatenate([prompts[0][0][:3], [5, 7]]), 3),
             (prompts[0][0][:3].copy(), 3)])
    assert cbp.metrics["prefix_hits"] == 2
    assert cbp.metrics["prefill_dispatches"] == 1  # one suffix, one reuse
