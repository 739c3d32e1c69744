"""Round-3 prefill roofline decomposition (VERDICT item 10).

E2E prefill at b=1 t=2048 (Qwen3-8B-like, 4 layers) measures 1.26x
quantized-vs-bf16; the reference's bar is ~1.5x.  This decomposes one
layer into its pieces to locate the non-GEMM remainder and compute the
achievable ceiling:

  linears   the 7 projections at M=2048 (int8 path vs bf16)
  attn      grouped einsum attention vs Pallas flash, t=2048
  rest      rms norms (x3) + rope + silu/mul + residuals (XLA, fused)

Ceiling = bf16_layer / (int8_linears + min(attn) + rest): if measured
e2e sits near the ceiling, the gap to 1.5x is structural (attention +
elementwise are format-independent), not implementation slack.

Usage: python benchmarks/exp_prefill_roofline_r3.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.kernels.tuning import quantize_int8_oneshot_bm
from qutlass_tpu.ops import int8path as I8
from qutlass_tpu.ops import pallas_ops as P
from qutlass_tpu.profiling import benchmark, chain_dep


def hadamard(n):
    hm = np.array([[1.0]])
    while hm.shape[0] < n:
        hm = np.block([[hm, hm], [hm, -hm]])
    return jnp.asarray(hm * n ** -0.5, jnp.bfloat16)


H32 = hadamard(32)
one = jnp.float32(1.0)
B, T, D, I, HEADS, KVH, HD = 1, 2048, 4096, 12288, 32, 8, 128
M = B * T

# the 7 projections: (K, N)
SHAPES = [("q", D, HEADS * HD), ("k", D, KVH * HD), ("v", D, KVH * HD),
          ("o", HEADS * HD, D), ("gate", D, I), ("up", D, I),
          ("down", I, D)]


def bench(fn, params):
    return min(benchmark(fn, repeats=3, params=params) for _ in range(2))


def time_linears():
    rows = []
    for name, K, N in SHAPES:
        w = jax.random.normal(jax.random.PRNGKey(hash(name) % 97), (N, K),
                              jnp.bfloat16) * 0.05
        wqt, wst = P.fused_quantize_mx(w, H32, rot_size=32, method="quest",
                                       layout="kmajor")
        wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
        a = jax.random.normal(jax.random.PRNGKey(K + N), (M, K),
                              jnp.bfloat16)
        p = {"wi8": wi8, "wsb": wsb, "wT": w.T, "a": a}
        oneshot = bool(quantize_int8_oneshot_bm(M, K))

        def qlin(d, j, pp):
            x = chain_dep(pp["a"], d)
            if oneshot:
                ai, sa, _ = KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                                      method="quest")
            else:
                cq, cs = P.fused_quantize_mx(x, H32, rot_size=32,
                                             method="quest",
                                             layout="kmajor_codes")
                ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
            return I8.matmul_mxf4_bf16_int8_kmajor(ai, pp["wi8"], sa,
                                                   pp["wsb"], one)

        def blin(d, j, pp):
            return chain_dep(pp["a"], d) @ pp["wT"]

        tq, tb = bench(qlin, p), bench(blin, p)
        rows.append((name, K, N, tq, tb))
        print(f"linear {name:5s} K={K:5d} N={N:5d}: int8 {tq*1e6:7.1f}us "
              f"bf16 {tb*1e6:7.1f}us ({tb/tq:4.2f}x)", flush=True)
    return rows


def time_attention():
    rng = np.random.default_rng(0)
    qh = jnp.asarray(rng.standard_normal((B, T, HEADS, HD)), jnp.bfloat16)
    kh = jnp.asarray(rng.standard_normal((B, T, KVH, HD)), jnp.bfloat16)
    vh = jnp.asarray(rng.standard_normal((B, T, KVH, HD)), jnp.bfloat16)
    causal = jnp.tril(jnp.ones((T, T), bool))
    rep = HEADS // KVH
    scale = HD ** -0.5
    p = {"q": qh, "k": kh, "v": vh}

    def einsum_attn(d, j, pp):
        q5 = chain_dep(pp["q"], d).reshape(B, T, KVH, rep, HD)
        scores = jnp.einsum("btgrd,bsgd->bgrts", q5.astype(jnp.float32),
                            pp["k"].astype(jnp.float32)) * scale
        scores = jnp.where(causal[None, None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bgrts,bsgd->btgrd", probs,
                          pp["v"].astype(jnp.float32))
        return attn.reshape(B, T, HEADS * HD).astype(jnp.bfloat16)

    def flash_attn(d, j, pp):
        from jax.experimental.pallas.ops.tpu import flash_attention as FA
        from qutlass_tpu.models.transformer import _flash_block_sizes
        qt = chain_dep(pp["q"], d).transpose(0, 2, 1, 3)
        kt = jnp.repeat(pp["k"].transpose(0, 2, 1, 3), rep, axis=1)
        vt = jnp.repeat(pp["v"].transpose(0, 2, 1, 3), rep, axis=1)
        o = FA.flash_attention(qt, kt, vt, causal=True, sm_scale=scale,
                               block_sizes=_flash_block_sizes(T))
        return o.transpose(0, 2, 1, 3).reshape(B, T, HEADS * HD)

    te, tf = bench(einsum_attn, p), bench(flash_attn, p)
    print(f"attention t={T}: einsum {te*1e6:7.1f}us flash {tf*1e6:7.1f}us "
          f"({te/tf:4.2f}x)", flush=True)
    return te, tf


def time_rest():
    x = jax.random.normal(jax.random.PRNGKey(5), (B, T, D), jnp.bfloat16)
    wn = jnp.ones((D,), jnp.bfloat16)
    gate = jax.random.normal(jax.random.PRNGKey(6), (B, T, I), jnp.bfloat16)
    up = jax.random.normal(jax.random.PRNGKey(7), (B, T, I), jnp.bfloat16)
    qh = jax.random.normal(jax.random.PRNGKey(8), (B, T, HEADS, HD),
                           jnp.bfloat16)
    positions = jnp.arange(T)
    from qutlass_tpu.models.transformer import _rms_norm, _rope
    p = {"x": x, "gate": gate, "up": up, "qh": qh}

    def rest(d, j, pp):
        xx = chain_dep(pp["x"], d)
        a = _rms_norm(xx, wn, 1e-6)          # x3 per layer; time 1, scale
        b2 = _rope(pp["qh"], positions, 1e6)
        act = (jax.nn.silu(pp["gate"].astype(jnp.float32))
               * pp["up"].astype(jnp.float32)).astype(jnp.bfloat16)
        return (a.sum(dtype=jnp.float32) + b2.sum(dtype=jnp.float32)
                + act.sum(dtype=jnp.float32)).reshape(1)

    t = bench(rest, p)
    print(f"rest (1 norm + rope + silu*up): {t*1e6:7.1f}us", flush=True)
    return t


def time_quantize(K):
    """Standalone fused quantize->int8 at M x K (the piece XLA CSE
    dedupes across q/k/v and gate/up in the whole-model program)."""
    a = jax.random.normal(jax.random.PRNGKey(K), (M, K), jnp.bfloat16)
    p = {"a": a}
    oneshot = bool(quantize_int8_oneshot_bm(M, K))

    def quant(d, j, pp):
        x = chain_dep(pp["a"], d)
        if oneshot:
            return KQ.fused_quantize_mx_int8(x, H32, rot_size=32,
                                             method="quest")[0]
        cq, cs = P.fused_quantize_mx(x, H32, rot_size=32, method="quest",
                                     layout="kmajor_codes")
        return I8.encode_int8(cq, cs, kmajor=True)[0]

    t = bench(quant, p)
    print(f"quantize M={M} K={K}: {t*1e6:7.1f}us", flush=True)
    return t


def main():
    rows = time_linears()
    te, tf = time_attention()
    tr = time_rest()
    tq4k = time_quantize(D)
    q_lin = sum(r[3] for r in rows)
    b_lin = sum(r[4] for r in rows)
    # XLA CSE pays 4 quantizes for the 7 linears (xin feeds q/k/v, attn
    # feeds o, xin2 feeds gate/up, act feeds down) — the standalone
    # linears above each paid their own, so remove 3 x quant(M, D)
    q_lin_cse = q_lin - 3.0 * tq4k
    # per layer: 3 norms ~ scale the measured bundle by ~2 (the bundle
    # holds 1 norm of [B,T,D]; qk norms are per-head over smaller dims)
    rest = 2.0 * tr
    attn_best = min(te, tf)
    q_layer = q_lin_cse + attn_best + rest
    # the bf16 model shares the attention path (flash with tuned blocks
    # where eligible), so the honest bf16 baseline layer uses the SAME
    # best attention; the einsum-bf16 figure is what a naive baseline
    # would measure
    b_layer = b_lin + attn_best + rest
    b_layer_einsum = b_lin + te + rest
    print(f"\nlayer model: int8 linears {q_lin*1e3:6.2f}ms "
          f"(CSE-adjusted {q_lin_cse*1e3:6.2f}ms) "
          f"bf16 linears {b_lin*1e3:6.2f}ms")
    print(f"attention best {attn_best*1e3:6.2f}ms  rest {rest*1e3:6.2f}ms")
    print(f"sum-of-parts layer: quant {q_layer*1e3:6.2f}ms "
          f"bf16 {b_layer*1e3:6.2f}ms -> ceiling {b_layer/q_layer:4.2f}x "
          f"(vs einsum-attention bf16: {b_layer_einsum/q_layer:4.2f}x)")
    print(f"GEMM-only ratio: {b_lin/q_lin_cse:4.2f}x (CSE-adjusted); "
          f"attention+rest fraction of quant layer: "
          f"{100*(attn_best+rest)/q_layer:4.1f}%")


if __name__ == "__main__":
    main()
