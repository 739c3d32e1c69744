"""Large-M sweep with timing quantiles — reference sm100 protocol.

The reference's sm100 benchmark sweeps M to 65,536 on a fixed geometry
(reference benchmarks/bench_mxfp4_sm100.py:176-194) and reports
0.5/0.2/0.8 timing quantiles (bench_mxfp4_sm120.py:109-125).  This
sweeps the production int8-MXU linear (fused quantize -> whole-K int8
dot + rank-1 fixup) on qwen3-32b K=5120 N=5120 for
M in {256 .. 65536}, recording per-point q20/q50/q80, achieved TF/s,
the bf16 baseline, and ideal-vs-actual against the measured pure
int8-dot envelope (350-358 TF/s on v5e, benchmarks/exp_int8b.py).

Writes benchmarks/results_longm_<tag>.json and prints one line per M.

Usage: python benchmarks/bench_longm.py [--mmax 65536] [--tag r3]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

INT8_ENVELOPE_TFS = 354.0   # midpoint of the measured pure-dot range


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mmax", type=int, default=65536)
    ap.add_argument("--tag", default="r3")
    ap.add_argument("--K", type=int, default=5120)
    ap.add_argument("--N", type=int, default=5120)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qutlass_tpu.ops import dispatch, int8path as I8
    if dispatch.on_tpu():
        from qutlass_tpu.ops import pallas_ops as P
    else:
        from qutlass_tpu.ops import emulation as P
    from qutlass_tpu.kernels.tuning import quantize_int8_oneshot_bm
    from qutlass_tpu.profiling import benchmark_quantiles, chain_dep

    K, N = args.K, args.N
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.float32(1.0)

    nw = 4
    wTs, wi8s, wsbs = [], [], []
    for i in range(nw):
        w = (jax.random.normal(jax.random.PRNGKey(i), (N, K),
                               jnp.bfloat16) * 0.05)
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                      layout="kmajor")
        wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
        wTs.append(w.T)
        wi8s.append(wi8)
        wsbs.append(wsb)
    del w
    params = {"wi8": wi8s, "wsb": wsbs, "wT": wTs}

    ms = [m for m in (256, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
          if m <= args.mmax]
    results = []
    for M in ms:
        # activations through params: a closure-captured array becomes a
        # compile-request constant, rejected >~100 MB by the tunnel
        # (HTTP 413) — M=65536 x K=5120 bf16 is 640 MB
        params["a"] = jax.random.normal(jax.random.PRNGKey(M), (M, K),
                                        jnp.bfloat16)
        oneshot = bool(quantize_int8_oneshot_bm(M, K))

        def quant_linear(d, j, p):
            x = chain_dep(p["a"], d)
            if oneshot:
                ai, sa, _ = P.fused_quantize_mx_int8(x, h, rot_size=32,
                                                     method="quest")
            else:
                cq, cs = P.fused_quantize_mx(x, h, method="quest",
                                             layout="kmajor_codes")
                ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
            return I8.matmul_mxf4_bf16_int8_kmajor(
                ai, p["wi8"][j % nw], sa, p["wsb"][j % nw], one)

        def bf16_linear(d, j, p):
            return chain_dep(p["a"], d) @ p["wT"][j % nw]

        # scale the loop down as M grows so one point stays ~1 min
        it = max(2, min(8, 16384 // M))
        t0 = time.time()
        q20, q50, q80 = benchmark_quantiles(quant_linear, iters=it,
                                            chain=4, params=params)
        b20, b50, b80 = benchmark_quantiles(bf16_linear, iters=it,
                                            chain=4, params=params)
        tf = 2 * M * N * K / q50 / 1e12
        row = {"M": M, "K": K, "N": N,
               "quant_us": {"q20": round(q20 * 1e6, 1),
                            "q50": round(q50 * 1e6, 1),
                            "q80": round(q80 * 1e6, 1)},
               "bf16_us": {"q20": round(b20 * 1e6, 1),
                           "q50": round(b50 * 1e6, 1),
                           "q80": round(b80 * 1e6, 1)},
               "tflops": round(tf, 1),
               "speedup_q50": round(b50 / q50, 3),
               "frac_of_int8_envelope": round(tf / INT8_ENVELOPE_TFS, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)
        print(f"  [{time.time()-t0:.0f}s] M={M}: {tf:.0f} TF/s "
              f"({100*tf/INT8_ENVELOPE_TFS:.0f}% of int8 envelope), "
              f"{b50/q50:.2f}x vs bf16", file=sys.stderr, flush=True)

    outp = os.path.join(REPO, "benchmarks",
                        f"results_longm_{args.tag}.json")
    with open(outp, "w") as f:
        json.dump({"geometry": "qwen3-32b", "K": K, "N": N,
                   "had": 32, "envelope_tflops": INT8_ENVELOPE_TFS,
                   "points": results}, f, indent=1)
    print(f"wrote {outp}", file=sys.stderr)


if __name__ == "__main__":
    main()
