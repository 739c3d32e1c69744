"""Round-4 fusion-pinning cost measurement (VERDICT r3 item 4).

QUTLASS_TPU_PIN_NORMS=1 wraps every _rms_norm and quantized-linear
boundary in lax.optimization_barrier so the int8 and fp4 evaluator
programs compile the f32 reductions identically (model-level bitwise
agreement on TPU, docs/NUMERICS.md).  The open question is its runtime
cost: barriers block fusion of the norm reductions into neighbours.

Times prefill at M in {512, 2048} and the decode step on the Qwen3-8B
reduced-depth stack, under whatever QUTLASS_TPU_PIN_NORMS the process
was launched with (the flag is trace-time; run the script twice):

    python benchmarks/exp_pin_cost_r4.py              # unpinned
    QUTLASS_TPU_PIN_NORMS=1 python benchmarks/exp_pin_cost_r4.py
"""
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qutlass_tpu.models import (ModelConfig, decode_step, init_params,
                                    prefill, quantize_model_weights)
    from qutlass_tpu.profiling import benchmark

    pin = os.environ.get("QUTLASS_TPU_PIN_NORMS", "0")
    print(f"device {jax.devices()[0].device_kind}  PIN_NORMS={pin}",
          file=sys.stderr, flush=True)

    cfg = ModelConfig(vocab_size=32768, hidden_size=4096,
                      intermediate_size=12288, num_layers=4, num_heads=32,
                      num_kv_heads=8, head_dim=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    qparams = quantize_model_weights(cfg, params, h)
    b = 8

    # weights/cache travel via ``params``: closure-captured arrays embed
    # as constants in the remote compile request (HTTP 413/broken pipe
    # above ~100 MB — see tpu_recheck_r2s4.py)
    for t in (512, 2048):
        prompt_base = jax.random.randint(jax.random.PRNGKey(1), (b, t),
                                         0, cfg.vocab_size)

        def op(d, j, pp, t=t):
            tok = ((jnp.abs(d) * 1e30).astype(jnp.int32)[0] + j) % 1000
            toks = (pp["toks"] + tok) % cfg.vocab_size
            logits, _ = prefill(cfg, pp["p"], toks, h, max_len=t,
                                quantized=True)
            return logits

        tp = benchmark(op, iters=2, chain=2, repeats=3,
                       params={"p": qparams, "toks": prompt_base})
        print(f"pin={pin} prefill t={t:5d} b={b}: {tp*1e3:8.2f} ms",
              flush=True)

    prompt = jax.random.randint(jax.random.PRNGKey(1), (b, 255),
                                0, cfg.vocab_size)
    _, cache = prefill(cfg, qparams, prompt, h, max_len=256, quantized=True)
    pos = jnp.int32(255)

    def dop(d, j, pp):
        tok = ((jnp.abs(d) * 1e30).astype(jnp.int32)[0] + j) % 1000
        toks = jnp.full((b,), tok, jnp.int32)
        logits, _ = decode_step(cfg, pp["p"], pp["cache"], toks, pos, h,
                                quantized=True)
        return logits

    td = benchmark(dop, iters=4, chain=4, repeats=3,
                   params={"cache": cache, "p": qparams})
    print(f"pin={pin} decode ctx=256 b={b}: {td*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
