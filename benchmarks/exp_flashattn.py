"""Probe: XLA einsum attention vs jax's Pallas TPU flash attention for
the prefill regime (Qwen3-8B geometry: 32 q heads / 8 kv heads, d=128).

The model's einsum path materializes fp32 scores [b, g, r, t, s] —
~0.5 GB of HBM traffic per layer at t=2048 — while flash attention
tiles the softmax online in VMEM.  This measures whether the shipped
kernel (jax.experimental.pallas.ops.tpu.flash_attention) pays off on
this toolchain and at which sequence lengths.

Usage: python benchmarks/exp_flashattn.py
"""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from jax.experimental.pallas.ops.tpu import flash_attention as FA
    from qutlass_tpu.profiling import benchmark, chain_dep

    heads, kvh, d = 32, 8, 128
    rep = heads // kvh
    rng = np.random.default_rng(0)

    for b, t in [(1, 512), (1, 2048), (4, 512), (8, 512), (1, 4096)]:
        qh = jnp.asarray(rng.standard_normal((b, t, heads, d)), jnp.bfloat16)
        kh = jnp.asarray(rng.standard_normal((b, t, kvh, d)), jnp.bfloat16)
        vh = jnp.asarray(rng.standard_normal((b, t, kvh, d)), jnp.bfloat16)
        causal = jnp.tril(jnp.ones((t, t), bool))
        scale = d ** -0.5

        def einsum_attn(qh, kh, vh):
            q5 = qh.reshape(b, t, kvh, rep, d)
            scores = jnp.einsum("btgrd,bsgd->bgrts", q5.astype(jnp.float32),
                                kh.astype(jnp.float32)) * scale
            scores = jnp.where(causal[None, None, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            attn = jnp.einsum("bgrts,bsgd->btgrd", probs,
                              vh.astype(jnp.float32)).astype(jnp.bfloat16)
            return attn.reshape(b, t, heads * d)

        def flash_attn(qh, kh, vh):
            # [b, t, h, d] -> [b, h, t, d]; kv repeated to full heads
            qt = qh.transpose(0, 2, 1, 3)
            kt = jnp.repeat(kh.transpose(0, 2, 1, 3), rep, axis=1)
            vt = jnp.repeat(vh.transpose(0, 2, 1, 3), rep, axis=1)
            o = FA.flash_attention(qt, kt, vt, causal=True, sm_scale=scale)
            return o.transpose(0, 2, 1, 3).reshape(b, t, heads * d)

        # correctness first
        ye = np.asarray(jax.jit(einsum_attn)(qh, kh, vh), np.float32)
        yf = np.asarray(jax.jit(flash_attn)(qh, kh, vh), np.float32)
        cos = float((ye.ravel() @ yf.ravel())
                    / (np.linalg.norm(ye) * np.linalg.norm(yf) + 1e-30))

        te = benchmark(lambda dep: einsum_attn(chain_dep(qh, dep), kh, vh))
        tf = benchmark(lambda dep: flash_attn(chain_dep(qh, dep), kh, vh))
        print(json.dumps({"b": b, "t": t, "einsum_us": round(te * 1e6, 1),
                          "flash_us": round(tf * 1e6, 1),
                          "speedup": round(te / tf, 3),
                          "cos": round(cos, 6)}), flush=True)


if __name__ == "__main__":
    main()
