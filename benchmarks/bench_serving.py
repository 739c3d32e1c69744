"""Serving decode-throughput benchmark: MXFP4 W4A4 vs bf16.

Times the compiled generate() loop at two step counts and reports the
slope (per-decode-step time), cancelling the fixed dispatch cost and
the shared prefill — the serving analogue of the reference's
end-to-end prefill benchmark (README.md:152-168).
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from qutlass_tpu.models import (ModelConfig, generate, init_params,
                                    quantize_model_weights)
    from qutlass_tpu.profiling import enable_compile_cache

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

    def step_time(p, quantized):
        s1, s2 = 16, 48
        outs = []
        for steps in (s1, s2):
            fn = lambda: generate(cfg, p, prompt, h, steps=steps,
                                  max_len=max_len, quantized=quantized)
            fn().block_until_ready()          # compile
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                fn().block_until_ready()
                best = min(best, time.perf_counter() - t0)
            print(f"  steps={steps}: total {best*1e3:8.1f} ms",
                  file=sys.stderr, flush=True)
            outs.append(best)
        return max(outs[1] - outs[0], 1e-9) / (s2 - s1)

    tq = step_time(qparams, True)
    tb = step_time(params, False)
    print(f"decode step: mxfp4 {tq*1e3:8.2f} ms ({batch/tq:8.0f} tok/s)  "
          f"bf16 {tb*1e3:8.2f} ms ({batch/tb:8.0f} tok/s)  "
          f"speedup {tb/tq:5.2f}x", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
