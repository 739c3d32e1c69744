"""Does the single-shot whole-K quantize->int8 kernel win at K=25600?

r4 evidence (exp_nv_largek_r4, results_nv_largek_r5_m2048.log): at
K=25600 the oneshot is VMEM-capped out (needs ~21 MB at bm=128 vs the
16 MB cap), so MX takes the two-pass composition (984 us, 107 GB/s)
and NV the serializing revisit kernel (1701 us, 62 GB/s) — the whole
NV-below-bf16 regression and the weak MX K=25600 cell live here.

v5e has 128 MB/core VMEM; this experiment force-enables the oneshot at
bm=128 (monkeypatched cap) and measures quantize-only + composed
linear for both formats, checking bitwise agreement with the
production routes first.

Usage: python benchmarks/exp_oneshot_largek_r5.py [--m 2048 --k 25600 --n 5120]
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
    ap.add_argument("--bm", type=int, default=128)
    args = ap.parse_args()
    M, K, N = args.m, args.k, args.n

    from qutlass_tpu.kernels import quantize as Q
    from qutlass_tpu.kernels import tuning
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

    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
    nqt, nst = P.fused_quantize_nv(w, h, gs, rot_size=32, layout="kmajor")
    ni8, nsb = I8.prepare_weight_nv_int8(nqt, nst)
    p = {"a": a}

    # --- bitwise gates against the production routes (unpatched) ---
    cq, cs = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                 layout="kmajor_codes")
    ref_ai, ref_sa, _ = I8.encode_int8(cq, cs, kmajor=True)
    xqt, xst = P.fused_quantize_nv(a, h, gs, rot_size=32, layout="kmajor")
    ref_ni, ref_ns = I8.encode_nv_int8(xqt, xst)

    # force the oneshot: patch the cap check used inside the fused fns
    forced = args.bm
    Q.quantize_int8_oneshot_bm = lambda rows, k, kind=None: forced
    tuning_orig = tuning.quantize_int8_oneshot_bm
    tuning.quantize_int8_oneshot_bm = lambda rows, k, kind=None: forced

    ai1, sa1, sb1 = Q.fused_quantize_mx_int8(a, h, rot_size=32,
                                             method="quest")
    ni1, ns1, nb1 = Q.fused_quantize_nv_int8(a, h, gs, rot_size=32,
                                             method="abs_max")
    ok_mx = (np.array_equal(np.asarray(ai1), np.asarray(ref_ai))
             and np.array_equal(np.asarray(sa1), np.asarray(ref_sa)))
    ok_nv = (np.array_equal(np.asarray(ni1), np.asarray(ref_ni))
             and np.array_equal(np.asarray(ns1), np.asarray(ref_ns)))
    print(f"bitwise mx_oneshot==two-pass: {ok_mx}  "
          f"nv_oneshot==fused-ref: {ok_nv}", flush=True)

    def q_mx1(d, j, pp):
        hc = chain_dep(h, d)
        ai, sa, _ = Q.fused_quantize_mx_int8(pp["a"], hc, rot_size=32,
                                             method="quest")
        return ai + sa.astype(ai.dtype)[:1]

    def q_nv1(d, j, pp):
        hc = chain_dep(h, d)
        ai, sx, _ = Q.fused_quantize_nv_int8(pp["a"], hc, gs, rot_size=32)
        return ai + sx.astype(ai.dtype)[:1]

    def comp_mx1(d, j, pp):
        hc = chain_dep(h, d)
        ai, sa, _ = Q.fused_quantize_mx_int8(pp["a"], hc, rot_size=32,
                                             method="quest")
        return I8.matmul_mxf4_bf16_int8_kmajor(ai, wi8, sa, wsb, one)

    def comp_nv1(d, j, pp):
        hc = chain_dep(h, d)
        xi, sx, _ = Q.fused_quantize_nv_int8(pp["a"], hc, gs, rot_size=32)
        return I8.matmul_mxf4_bf16_int8_kk(xi, ni8, sx, nsb, one)

    flops = 2.0 * M * N * K
    for name, fn in [("quant-mx-1shot", q_mx1), ("quant-nv-1shot", q_nv1),
                     ("composed-mx-1shot", comp_mx1),
                     ("composed-nv-1shot", comp_nv1)]:
        try:
            t = min(benchmark(fn, repeats=3, params=p) for _ in range(2))
            tf = flops / t / 1e12 if name.startswith("composed") else 0
            gbs = 2 * M * K / t / 1e9
            print(f"{name:18s} {t*1e6:9.1f} us  "
                  + (f"{tf:6.1f} TF/s" if tf else f"{gbs:6.0f} GB/s in"),
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    tuning.quantize_int8_oneshot_bm = tuning_orig


if __name__ == "__main__":
    main()
