"""Decompose the NV-vs-MX gap at K=25600 (bench r4: NV 0.87x, MX 1.10x
at M=2048 N=5120).

Hypothesis: production MX routing prefers the TWO-PASS composition
(codes kernel + XLA encode that overlaps under the int8 dot) whenever
the oneshot kernel doesn't fit VMEM (models/transformer.py:332-348),
but the NV path calls fused_quantize_nv_int8 unconditionally — which
at K=25600 takes the REVISIT Pallas kernel internally, serializing the
whole quantize before the dot.  Measures, chained through the 2 KB
Hadamard (the exp_longm_r4 harness):

  quant-mx-2pass   production MX quantize route (two-pass at this K)
  quant-nv-fused   current NV route (revisit kernel)
  quant-nv-2pass   candidate: fused_quantize_nv(kmajor) + encode_nv_int8
  composed-mx      two-pass MX + int8 dot (bench.py quant_linear)
  composed-nv      current fused NV + int8 dot (bench.py nv_linear)
  composed-nv2     candidate two-pass NV + int8 dot

Usage: python benchmarks/exp_nv_largek_r4.py [--m 2048 --k 25600 --n 5120]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--k", type=int, default=25600)
    ap.add_argument("--n", type=int, default=5120)
    args = ap.parse_args()
    M, K, N = args.m, args.k, args.n

    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.ops import int8path as I8
    from qutlass_tpu.profiling import benchmark, chain_dep

    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)
    gs = jnp.float32(6.0)

    a = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (N, K), jnp.bfloat16) * 0.05

    # one-time weight prep, both formats (bench.py protocol)
    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    nqt, nst = P.fused_quantize_nv(w, h, gs, rot_size=32, layout="kmajor")
    ni8, nsb = I8.prepare_weight_nv_int8(nqt, nst)
    p = {"a": a}

    # fold the scales into the returned value so XLA cannot dead-code
    # eliminate the scale computation on the two-pass XLA-encode routes
    # (the fused Pallas kernel must compute all outputs either way)
    def q_mx2(d, j, pp):
        hc = chain_dep(h, d)
        cq, cs = P.fused_quantize_mx(pp["a"], hc, rot_size=32,
                                     method="quest", layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return ai + sa.astype(ai.dtype)[:1]

    def q_nvf(d, j, pp):
        hc = chain_dep(h, d)
        ai, sx, _ = P.fused_quantize_nv_int8(pp["a"], hc, gs, rot_size=32)
        return ai + sx.astype(ai.dtype)[:1]

    def q_nv2(d, j, pp):
        hc = chain_dep(h, d)
        xqt, xst = P.fused_quantize_nv(pp["a"], hc, gs, rot_size=32,
                                       layout="kmajor")
        ai, sx = I8.encode_nv_int8(xqt, xst)
        return ai + sx.astype(ai.dtype)[:1]

    def comp_mx(d, j, pp):
        hc = chain_dep(h, d)
        cq, cs = P.fused_quantize_mx(pp["a"], hc, rot_size=32,
                                     method="quest", layout="kmajor_codes")
        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, wi8, sa, wsb, one)

    def comp_nv(d, j, pp):
        hc = chain_dep(h, d)
        xi, sx, _ = P.fused_quantize_nv_int8(pp["a"], hc, gs, rot_size=32)
        return I8.matmul_mxf4_bf16_int8_kk(xi, ni8, sx, nsb, one)

    def comp_nv2(d, j, pp):
        hc = chain_dep(h, d)
        xqt, xst = P.fused_quantize_nv(pp["a"], hc, gs, rot_size=32,
                                       layout="kmajor")
        xi, sx = I8.encode_nv_int8(xqt, xst)
        return I8.matmul_mxf4_bf16_int8_kk(xi, ni8, sx, nsb, one)

    # candidate two-pass must agree with the fused route bit-wise
    xa = np.asarray(comp_nv(jnp.zeros((), jnp.bfloat16), 0, p), np.float32)
    xb = np.asarray(comp_nv2(jnp.zeros((), jnp.bfloat16), 0, p), np.float32)
    rel = float(np.abs(xa - xb).max() / (np.abs(xa).max() + 1e-9))
    print(f"nv fused-vs-2pass rel maxdiff {rel:.3e}", flush=True)

    flops = 2.0 * M * N * K
    for name, fn in [("quant-mx-2pass", q_mx2), ("quant-nv-fused", q_nvf),
                     ("quant-nv-2pass", q_nv2), ("composed-mx", comp_mx),
                     ("composed-nv", comp_nv), ("composed-nv2", comp_nv2)]:
        try:
            t = min(benchmark(fn, repeats=3, params=p) for _ in range(2))
            tf = flops / t / 1e12 if name.startswith("composed") else 0
            gbs = 2 * M * K / t / 1e9
            print(f"{name:15s} {t*1e6:9.1f} us  "
                  + (f"{tf:6.1f} TF/s" if tf else f"{gbs:6.0f} GB/s in"),
                  flush=True)
        except Exception as e:
            print(f"{name:15s} FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
