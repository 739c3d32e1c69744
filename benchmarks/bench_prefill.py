"""End-to-end prefill benchmark: MXFP4 W4A4 model vs bf16 model.

Mirrors the reference's headline experiment (README.md:152-168 —
Qwen3-8B prefill speedup vs BF16 over batch x seqlen) using the in-repo
model family.  Depth is configurable so the run fits the benchmarking
window; per-layer cost is representative.

Usage: python benchmarks/bench_prefill.py [--layers 4] [--batch 1]
       [--seqs 512 2048]
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seqs", type=int, nargs="*", default=[512, 2048])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from qutlass_tpu.models import (ModelConfig, forward, init_params,
                                    quantize_model_weights)

    cfg = ModelConfig(vocab_size=8192, hidden_size=4096,
                      intermediate_size=12288, num_layers=args.layers,
                      num_heads=32, num_kv_heads=8, head_dim=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    qparams = quantize_model_weights(cfg, params, h)

    from qutlass_tpu.profiling import benchmark

    for seq in args.seqs:
        tokens = jnp.zeros((args.batch, seq), jnp.int32)

        # params must travel as jit ARGUMENTS: closure-captured weights
        # are embedded as HLO constants and the remote-compile tunnel
        # rejects requests over ~100 MB (HTTP 413)
        def fwd_q(d, p):
            tk = tokens + (d[0] * 0).astype(jnp.int32)
            return forward(cfg, p, tk, h, quantized=True)

        def fwd_b(d, p):
            tk = tokens + (d[0] * 0).astype(jnp.int32)
            return forward(cfg, p, tk)

        tq = benchmark(fwd_q, iters=2, chain=2, repeats=3, params=qparams)
        tb = benchmark(fwd_b, iters=2, chain=2, repeats=3, params=params)
        rec = dict(metric="prefill_speedup_mxfp4_vs_bf16",
                   layers=args.layers, batch=args.batch, seq=seq,
                   mxfp4_ms=round(tq * 1e3, 2), bf16_ms=round(tb * 1e3, 2),
                   speedup=round(tb / tq, 3))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
