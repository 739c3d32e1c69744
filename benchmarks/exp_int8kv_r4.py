"""Round-4 int8 KV cache decode measurement (VERDICT r3 item 5).

r3 measured the int8 cache 6% SLOWER than bf16 at ctx=2048 b=8 because
the dequant MATERIALIZED a full fp32 cache copy (2x the bf16 traffic).
The r4 _attend change factors the per-position scales out of both
attention contractions (q.(k*s) == (q.k)*s on scores, p.(v*s) ==
(p*s).v on output), so the int8 cache streams at half the bf16 bytes
and the scaling runs on scores/probs (rep*t/head_dim smaller).

Measures the decode step at growing context (the cache-bandwidth-bound
regime) for bf16 vs int8 caches, quantized weights in both.

Usage: python benchmarks/exp_int8kv_r4.py [--ctxs 2048,4096,8192]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctxs", default="2048,4096,8192")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--layers", type=int, default=4)
    args = ap.parse_args()
    ctxs = [int(c) for c in args.ctxs.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qutlass_tpu.models import (ModelConfig, decode_step, init_params,
                                    prefill, quantize_model_weights)
    from qutlass_tpu.profiling import benchmark

    print("device", jax.devices()[0].device_kind, file=sys.stderr,
          flush=True)

    # Qwen3-8B layer geometry, reduced depth (tunnel compile budget)
    cfg = ModelConfig(vocab_size=32768, hidden_size=4096,
                      intermediate_size=12288, num_layers=args.layers,
                      num_heads=32, num_kv_heads=8, head_dim=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    qparams = quantize_model_weights(cfg, params, h)
    b = args.batch

    for ctx in ctxs:
        # short prompt into a max_len=ctx cache: the decode einsum
        # streams the WHOLE cache buffer regardless of fill level, so
        # the per-step cost matches a fully-filled context without
        # compiling a giant ctx-token prefill program (the ctx=4096+
        # prefill compile broke the remote-compile tunnel)
        prompt = jax.random.randint(jax.random.PRNGKey(1), (b, 128),
                                    0, cfg.vocab_size)
        pos = jnp.int32(ctx - 1)
        times = {}
        for fmt in ("bf16", "int8"):
            _, cache = prefill(cfg, qparams, prompt, h, max_len=ctx,
                               quantized=True, cache_format=fmt)
            # weights/cache must travel via ``params``: closure-captured
            # arrays embed as constants in the remote compile request
            # (HTTP 413 / broken pipe above ~100 MB — see
            # tpu_recheck_r2s4.py)
            pp = {"cache": cache, "p": qparams}

            def op(d, j, pp):
                tok = ((jnp.abs(d) * 1e30).astype(jnp.int32)[0] + j) % 1000
                toks = jnp.full((b,), tok, jnp.int32)
                logits, _ = decode_step(cfg, pp["p"], pp["cache"], toks,
                                        pos, h, quantized=True)
                return logits

            times[fmt] = benchmark(op, iters=4, chain=4, repeats=3,
                                   params=pp)
            del cache, pp
        r = times["bf16"] / times["int8"]
        print(f"ctx={ctx:5d} b={b}: bf16 {times['bf16']*1e6:8.1f}us  "
              f"int8 {times['int8']*1e6:8.1f}us  int8 speedup {r:5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
