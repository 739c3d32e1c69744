"""Verify drive (round 4): canonical quantize->GEMM->backward flow plus
the r4 factored-scale int8-KV attention path at the package boundary.

Run on TPU (default platform) and on CPU
(PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/verify_r4_int8kv.py).
"""
import sys

sys.path.insert(0, "/root/repo")

import ml_dtypes
import numpy as np

import jax
import jax.numpy as jnp

import qutlass_tpu as q
from qutlass_tpu.formats import golden as G


def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray((hm * n ** -0.5).astype(ml_dtypes.bfloat16))


def main():
    print("platform:", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)
    rng = np.random.default_rng(0)
    h32 = hadamard(32)

    # 1. canonical quantize -> GEMM, scales + product vs fp64 golden
    x = jnp.asarray((rng.standard_normal((512, 1024)) * 25
                     ).astype(ml_dtypes.bfloat16))
    xq, xs = q.fusedQuantizeMx(x, h32, method="quest")
    ref = G.quantize_mx(np.asarray(x, np.float64),
                        np.asarray(h32, np.float64), 32, "quest")
    assert np.array_equal(np.asarray(xs)[:512, :32], ref["e8m0"]), \
        "quantize scales != fp64 golden"
    y = q.matmul_mxf4_bf16_tn(xq, xq, q.to_blocked(xs), q.to_blocked(xs),
                              jnp.asarray([1.0], jnp.float32))
    dq = ref["dq"]
    want = (dq @ dq.T).astype(ml_dtypes.bfloat16)
    assert np.array_equal(np.asarray(y), want), "GEMM != bf16(fp64 matmul)"
    print("1. quantize+GEMM bit-exact vs golden: OK", flush=True)

    # 2. backward_t vs golden
    g = jnp.asarray((rng.standard_normal((512, 256))
                     ).astype(ml_dtypes.bfloat16))
    bq, bs = q.backward_t_bf16(g, h32)
    bref = G.backward_quantize(np.asarray(g, np.float64).T,
                               np.asarray(h32, np.float64))
    assert np.array_equal(np.asarray(bs), bref["e8m0"]), "bwd scales"
    bdq = G.dq_fp4(np.asarray(bq), np.asarray(bs), 32, 3.0)
    assert (bdq != bref["dq"]).mean() <= 1e-4, "bwd dequant"
    print("2. backward_t bit-exact vs golden: OK", flush=True)

    # 3. the r4 serving change: int8 KV cache with scales factored out
    # of the attention contractions. Generate greedily with int8 cache
    # and compare per-step top-1 and the score math against an
    # independently computed materialized-dequant attention.
    from qutlass_tpu.models import (ModelConfig, decode_step, init_params,
                                    prefill, quantize_model_weights)
    from qutlass_tpu.models.serving import (_attend, _kv_dequantize,
                                            _kv_quantize)

    cfg = ModelConfig(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_layers=2, num_heads=4,
                      num_kv_heads=2, head_dim=64)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_model_weights(cfg, params, h32)
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 9), 0, 512)

    # 3a. _attend factored vs materialized-dequant reference
    kv = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 2, 64),
                           jnp.bfloat16)
    qh = jax.random.normal(jax.random.PRNGKey(3), (2, 1, 4, 64),
                           jnp.bfloat16)
    ki, ks = _kv_quantize(kv)
    vi, vs = _kv_quantize(kv[:, ::-1])
    a_fact = _attend(cfg, qh, ki, vi, 12, ks=ks, vs=vs)
    a_ref = _attend(cfg, qh, _kv_dequantize(ki, ks),
                    _kv_dequantize(vi, vs), 12)
    d = np.abs(np.asarray(a_fact, np.float32)
               - np.asarray(a_ref, np.float32))
    rel = d.max() / max(np.abs(np.asarray(a_ref, np.float32)).max(), 1e-9)
    assert rel < 2e-2, f"factored attend rel diff {rel}"
    print(f"3a. factored int8 attend vs materialized dequant: "
          f"max rel {rel:.2e} OK", flush=True)

    # 3b. end-to-end: teacher-forced decode logits with the int8 cache
    # stay at cosine > 0.99 vs the bf16 cache (the suite's quality
    # criterion — greedy argmax on a tiny RANDOM model is chaotic and
    # not a meaningful agreement metric)
    def cos(a, b):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30)

    lb, cb = prefill(cfg, params, toks[:, :6], h32, max_len=16)
    li, ci = prefill(cfg, params, toks[:, :6], h32, max_len=16,
                     cache_format="int8")
    worst = cos(lb, li)
    for p in range(6, 9):
        lb, cb = decode_step(cfg, params, cb, toks[:, p], jnp.int32(p), h32)
        li, ci = decode_step(cfg, params, ci, toks[:, p], jnp.int32(p), h32)
        worst = min(worst, cos(lb, li))
    assert worst > 0.99, f"int8-cache decode logits cosine {worst}"
    print(f"3b. int8-cache decode logits cosine vs bf16 cache: "
          f"{worst:.4f} OK", flush=True)
    print("ALL VERIFY CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
