"""Full MXFP4 / NVFP4 benchmark sweep (reference protocol:
benchmarks/bench_mxfp4_sm120.py:161-178, bench_nvfp4_sm120.py).

Per (model layer N,K) x hadamard size x M: times
  actual — quantize + kmajor GEMM (the production composed path),
  fused  — the single-kernel quantize+GEMM linear (v2),
  ideal  — GEMM only, operands pre-quantized,
  bf16   — the baseline matmul,
reporting TFLOP/s = 2*M*N*K/t with the slope-timed chained-scan
harness (qutlass_tpu.profiling) and weights cycled per chain step.

Usage:  python benchmarks/bench_mxfp4.py [--model qwen3-32b] [--had 32]
        [--fmt mx|nv]

NV mode uses the abs-max (vLLM-compatible) quantizer with unit global
scales — same kernels and alpha plumbing as the two-level scheme, with
the per-tensor scale computation held constant so the sweep measures
kernel cost.
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

MODELS = {
    # (K, N) per layer, as in the reference benchmarks
    "qwen3-32b": [(5120, 5120), (5120, 51200), (25600, 5120)],
    "llama31-70b": [(8192, 8192), (8192, 57344), (28672, 8192)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-32b", choices=list(MODELS))
    ap.add_argument("--had", type=int, default=32, choices=[16, 32, 64, 128])
    ap.add_argument("--ms", type=int, nargs="*",
                    default=[1, 16, 64, 256, 1024, 2048])
    ap.add_argument("--out", default=None)
    ap.add_argument("--fmt", default="mx", choices=["mx", "nv"])
    ap.add_argument("--geo", type=int, default=None,
                    help="index into the model's layer-geometry table")
    ap.add_argument("--skip-fused", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import (benchmark, chain_dep,
                                       enable_compile_cache)

    enable_compile_cache()
    print(f"# device={jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < args.had:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * args.had ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)
    NW = 4   # weights cycled per chain step (defeats VMEM residency)

    if args.fmt == "nv":
        args.skip_fused = True   # fused linear bench is MX-tuned
        gs1 = jnp.ones((), jnp.float32)

        def quantize(x):
            return P.fused_quantize_nv(x, h, gs1, rot_size=args.had,
                                       method="abs_max", layout="kmajor")

        gemm = P.matmul_nvf4_bf16_kmajor
    else:
        def quantize(x):
            return P.fused_quantize_mx(x, h, rot_size=args.had,
                                       method="quest", layout="kmajor")

        gemm = P.matmul_mxf4_bf16_kmajor

    def p_wqts_for_int8(qp):
        return qp["wqt"]

    results = []
    geos = MODELS[args.model]
    if args.geo is not None:
        geos = [geos[args.geo]]
    for K, N in geos:
        wTs, wqts, wsts = [], [], []
        for _ in range(NW):
            w = jnp.asarray((rng.standard_normal((N, K)) * 0.05)
                            .astype(ml_dtypes.bfloat16))
            wqt, wst = quantize(w)
            wTs.append(w.T)
            wqts.append(wqt)
            wsts.append(wst)
        del w
        for M in args.ms:
            a = jnp.asarray(rng.standard_normal((M, K))
                            .astype(ml_dtypes.bfloat16))
            aqt, ast = quantize(a)

            qp = {"wqt": wqts, "wst": wsts, "a": a, "aqt": aqt, "ast": ast}
            bp = {"wT": wTs, "a": a}

            def actual(d, j, p):
                x = chain_dep(p["a"], d)
                xq, xs = quantize(x)
                return gemm(xq, p["wqt"][j % NW], xs, p["wst"][j % NW], one)

            def fused(d, j, p):
                return P.fused_linear_mxf4(chain_dep(p["a"], d),
                                           p["wqt"][j % NW],
                                           p["wst"][j % NW], h, one,
                                           rot_size=args.had)

            def ideal(d, j, p):
                return gemm(chain_dep(p["aqt"], d), p["wqt"][j % NW],
                            p["ast"], p["wst"][j % NW], one)

            def bf16(d, j, p):
                return chain_dep(p["a"], d) @ p["wT"][j % NW]

            cols = [("actual", actual, qp), ("ideal", ideal, qp),
                    ("bf16", bf16, bp)]
            if not args.skip_fused:
                cols.insert(1, ("fused", fused, qp))
            if args.fmt == "mx":
                # the int8-MXU production path (ops/int8path.py)
                from qutlass_tpu.ops import int8path as I8
                wi8s, wsbs = [], []
                for wq_, ws_ in zip(p_wqts_for_int8(qp), qp["wst"]):
                    wi, wsb, _ = I8.prepare_weight_int8(wq_, ws_)
                    wi8s.append(wi)
                    wsbs.append(wsb)
                ip = {"wi8": wi8s, "wsb": wsbs, "a": qp["a"]}

                # mirror production routing (models/transformer._linear):
                # whole-K oneshot when it fits, else two-pass; chain
                # through the TINY Hadamard — chaining through the
                # activation taxed the quantized path with a full
                # unfused activation copy per iteration (the r4
                # harness artifact, exp_longm_r4)
                from qutlass_tpu.kernels.tuning import (
                    quantize_int8_oneshot_bm)
                use_oneshot = bool(quantize_int8_oneshot_bm(M, K))

                def int8_actual(d, j, p):
                    hc = chain_dep(h, d)
                    if use_oneshot:
                        ai, sa, _ = P.fused_quantize_mx_int8(
                            p["a"], hc, rot_size=args.had, method="quest")
                    else:
                        cq, cs = P.fused_quantize_mx(
                            p["a"], hc, rot_size=args.had, method="quest",
                            layout="kmajor_codes")
                        ai, sa, _ = I8.encode_int8(cq, cs, kmajor=True)
                    return I8.matmul_mxf4_bf16_int8_kmajor(
                        ai, p["wi8"][j % NW], sa, p["wsb"][j % NW], one)

                ai0, sa0, _ = I8.encode_int8(
                    *P.fused_quantize_mx(qp["a"], h, rot_size=args.had,
                                         method="quest",
                                         layout="kmajor_codes"),
                    kmajor=True)
                ip.update(ai=ai0, sa=sa0)

                def int8_ideal(d, j, p):
                    dd = d.reshape(()).astype(jnp.float32)
                    ai = jnp.maximum(p["ai"],
                                     (dd * 1e-30 - 127).astype(jnp.int8))
                    return I8.matmul_mxf4_bf16_int8_kmajor(
                        ai, p["wi8"][j % NW], p["sa"], p["wsb"][j % NW], one)

                cols += [("int8_actual", int8_actual, ip),
                         ("int8_ideal", int8_ideal, ip)]
            rec = dict(model=args.model, fmt=args.fmt, K=K, N=N, M=M,
                       had=args.had)
            for name, op, pp in cols:
                t = benchmark(op, params=pp)
                rec[name + "_us"] = round(t * 1e6, 1)
                rec[name + "_tflops"] = round(2 * M * N * K / t / 1e12, 2)
            rec["speedup_vs_bf16"] = round(
                rec["bf16_us"] / min(rec.get("int8_actual_us", 1e30),
                                     rec["actual_us"],
                                     rec.get("fused_us", rec["actual_us"])), 3)
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
