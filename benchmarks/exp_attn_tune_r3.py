"""Prefill attention tuning (round 3): flash block sizes vs splash.

The roofline decomposition (exp_prefill_roofline_r3.py) shows prefill
attention at t=2048 costs 1.96 ms (flash) / 2.26 ms (einsum) — ~40% of
the quantized layer at ~9% MFU against a ~180 us causal bf16 roofline.
Attention is format-independent, so shaving it raises the
quant-vs-bf16 e2e ratio toward the GEMM-only ratio AND the absolute
throughput of both paths.

Candidates (B=1, t=2048/4096, 32 q heads / 8 kv heads, hd=128):
  einsum        grouped einsum, f32 scores (current t<2048 path)
  flash-def     pallas flash_attention, default blocks, KV repeated
  flash-BQxBK   tuned BlockSizes
  splash-def    splash MQA kernel vmapped over kv heads (GQA native,
                no KV repeat), default blocks
  splash-BQxBK  tuned splash BlockSizes

Correctness: max |diff| vs einsum f32 reference on every candidate.

Usage: python benchmarks/exp_attn_tune_r3.py [--t 2048]
"""
import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.profiling import benchmark, chain_dep

HEADS, KVH, HD = 32, 8, 128
REP = HEADS // KVH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    args = ap.parse_args()
    T = args.t
    B = 1
    scale = HD ** -0.5

    rng = np.random.default_rng(0)
    qh = jnp.asarray(rng.standard_normal((B, T, HEADS, HD)), jnp.bfloat16)
    kh = jnp.asarray(rng.standard_normal((B, T, KVH, HD)), jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((B, T, KVH, HD)), jnp.bfloat16)
    causal = jnp.tril(jnp.ones((T, T), bool))
    p = {"q": qh, "k": kh, "v": vh}

    def einsum_attn(d, j, pp):
        q5 = chain_dep(pp["q"], d).reshape(B, T, KVH, REP, HD)
        scores = jnp.einsum("btgrd,bsgd->bgrts", q5.astype(jnp.float32),
                            pp["k"].astype(jnp.float32)) * scale
        scores = jnp.where(causal[None, None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bgrts,bsgd->btgrd", probs,
                          pp["v"].astype(jnp.float32))
        return attn.reshape(B, T, HEADS * HD).astype(jnp.bfloat16)

    from jax.experimental.pallas.ops.tpu import flash_attention as FA

    def flash_attn(blocks):
        def f(d, j, pp):
            qt = chain_dep(pp["q"], d).transpose(0, 2, 1, 3)
            kt = jnp.repeat(pp["k"].transpose(0, 2, 1, 3), REP, axis=1)
            vt = jnp.repeat(pp["v"].transpose(0, 2, 1, 3), REP, axis=1)
            o = FA.flash_attention(qt, kt, vt, causal=True, sm_scale=scale,
                                   block_sizes=blocks)
            return o.transpose(0, 2, 1, 3).reshape(B, T, HEADS * HD)
        return f

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as SK,
        splash_attention_mask as ML,
    )

    def splash_attn(block_q, block_kv):
        mask = ML.MultiHeadMask(
            [ML.CausalMask((T, T)) for _ in range(REP)])
        bs = None
        if block_q:
            bs = SK.BlockSizes(block_q=block_q, block_kv=block_kv,
                               block_kv_compute=block_kv)
        kern = SK.make_splash_mqa_single_device(mask, block_sizes=bs)
        kern = jax.vmap(kern, in_axes=(0, 0, 0))   # over kv heads

        def f(d, j, pp):
            # [B,T,H,D] -> [KVH, REP, T, D] (B=1); splash mqa wants
            # q [heads, T, hd] per kv group, k/v [T, hd]
            qt = (chain_dep(pp["q"], d)
                  .reshape(T, KVH, REP, HD).transpose(1, 2, 0, 3))
            kt = pp["k"].reshape(T, KVH, HD).transpose(1, 0, 2)
            vt = pp["v"].reshape(T, KVH, HD).transpose(1, 0, 2)
            o = kern(qt * scale, kt, vt)           # [KVH, REP, T, HD]
            return (o.transpose(2, 0, 1, 3)
                    .reshape(B, T, HEADS * HD).astype(jnp.bfloat16))
        return f

    ref = np.asarray(einsum_attn(jnp.zeros((), jnp.bfloat16), 0, p),
                     np.float32)

    cands = [("einsum", einsum_attn), ("flash-def", flash_attn(None))]
    for bq, bkm, bk in ((512, 1024, 512), (1024, 1024, 1024),
                        (512, 2048, 512), (2048, 2048, 512),
                        # small-t candidates (r4: tune t=512/1536)
                        (512, 512, 512), (512, 512, 256),
                        (256, 512, 256), (256, 256, 256),
                        (1536, 1536, 512), (512, 1536, 512)):
        if bkm > T or bq > T:
            continue
        cands.append((f"flash-{bq}x{bkm}x{bk}", flash_attn(
            FA.BlockSizes(block_q=bq, block_k_major=bkm, block_k=bk,
                          block_b=1))))
    for bq, bkv in ((None, None), (512, 1024), (1024, 1024), (2048, 1024),
                    (1024, 2048), (2048, 2048), (512, 512), (256, 512),
                    (256, 256)):
        if bq is not None and (bq > T or bkv > T):
            continue
        name = f"splash-{bq}x{bkv}" if bq else "splash-def"
        try:
            # splash validates block divisibility at construction time
            cands.append((name, splash_attn(bq, bkv)))
        except Exception as e:
            print(f"{name:18s} SKIP {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    # useful causal FLOPs: 2 matmuls * 2*T^2*HD*HEADS / 2
    flops = 2 * 2 * T * T * HD * HEADS / 2
    for name, fn in cands:
        try:
            out = np.asarray(fn(jnp.zeros((), jnp.bfloat16), 0, p),
                             np.float32)
            err = float(np.abs(out - ref).max())
            t = min(benchmark(fn, repeats=3, params=p) for _ in range(2))
            print(f"{name:18s} {t*1e6:8.1f} us  {flops/t/1e12:6.1f} TF/s "
                  f"maxdiff {err:.3e}", flush=True)
        except Exception as e:
            print(f"{name:18s} FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
