"""Serving decode-throughput benchmark: MXFP4 W4A4 vs bf16.

Times one KV-cache decode step (the serving hot loop) with the
slope-timed chained-scan harness — the per-token cost that dominates
generation; the serving analogue of the reference's end-to-end
benchmark (README.md:152-168).
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from qutlass_tpu.models import (ModelConfig, decode_step, init_params,
                                    prefill, quantize_model_weights)
    from qutlass_tpu.profiling import benchmark, enable_compile_cache

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, file=sys.stderr, flush=True)

    # Qwen3-8B layer geometry, reduced depth (tunnel compile budget)
    cfg = ModelConfig(vocab_size=32768, hidden_size=4096,
                      intermediate_size=12288, num_layers=4, num_heads=32,
                      num_kv_heads=8, head_dim=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    qparams = quantize_model_weights(cfg, params, h)

    batch, prompt_len, max_len = 8, 128, 256
    prompt = jax.random.randint(jax.random.PRNGKey(1), (batch, prompt_len),
                                0, cfg.vocab_size)
    pos = jnp.int32(prompt_len)

    def step_time(p, quantized):
        _, cache = prefill(cfg, p, prompt, h, max_len=max_len,
                           quantized=quantized)
        pp = {"params": p, "cache": cache}

        def op(d, j, pp):
            tok = ((jnp.abs(d) * 1e30).astype(jnp.int32)[0] + j) % 1000
            toks = jnp.full((batch,), tok, jnp.int32)
            logits, _ = decode_step(cfg, pp["params"], pp["cache"], toks,
                                    pos, h, quantized=quantized)
            return logits

        return benchmark(op, iters=4, chain=4, params=pp)

    tq = step_time(qparams, True)
    tb = step_time(params, False)
    rec = {"metric": "serving_decode_step_speedup_mxfp4_vs_bf16",
           "layers": cfg.num_layers, "batch": batch,
           "mxfp4_ms": round(tq * 1e3, 3), "bf16_ms": round(tb * 1e3, 3),
           "mxfp4_tok_s": round(batch / tq), "bf16_tok_s": round(batch / tb),
           "speedup": round(tb / tq, 3)}
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
