"""Full MXFP4 benchmark sweep (reference protocol:
benchmarks/bench_mxfp4_sm120.py:161-178).

Per (model layer N,K) x hadamard size x M: times the "actual" path
(fused quantize + GEMM), the "ideal" path (GEMM only, operands
pre-quantized), and the bf16 matmul, reporting TFLOP/s = 2*M*N*K/t.

Usage:  python benchmarks/bench_mxfp4.py [--model qwen3-32b] [--out f.json]
"""
import argparse
import json
import sys
import time

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    import ml_dtypes

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from qutlass_tpu.ops import pallas_ops as P

    def bench_scan(op, iters=8, chain=8):
        @jax.jit
        def loop(dep):
            def body(c, _):
                for _ in range(chain):
                    out = op(c)
                    c = out.ravel()[:1].astype(jnp.float32) * 1e-30
                return c, None
            c, _ = lax.scan(body, dep, None, length=iters)
            return c
        d = jnp.zeros((1,), jnp.float32)
        loop(d).block_until_ready()
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            loop(d).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / (iters * chain))
        return best

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < args.had:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * args.had ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    results = []
    for K, N in MODELS[args.model]:
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05)
                        .astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=args.had,
                                       method="quest", layout="kmajor")
        wT = w.T
        for M in args.ms:
            a = jnp.asarray(rng.standard_normal((M, K))
                            .astype(ml_dtypes.bfloat16))
            aqt, ast = P.fused_quantize_mx(a, h, rot_size=args.had,
                                           method="quest", layout="kmajor")

            def actual(d):
                x = a + d.astype(jnp.bfloat16)
                if M <= 256:
                    return P.fused_linear_mxf4(x, wqt, wst, h, one,
                                               rot_size=args.had)
                xq, xs = P.fused_quantize_mx(x, h, rot_size=args.had,
                                             method="quest", layout="kmajor")
                return P.matmul_mxf4_bf16_kmajor(xq, wqt, xs, wst, one)

            def ideal(d):
                return P.matmul_mxf4_bf16_kmajor(
                    aqt, wqt, ast, wst, one + d)

            def bf16(d):
                return (a + d.astype(jnp.bfloat16)) @ wT

            rec = dict(model=args.model, K=K, N=N, M=M, had=args.had)
            for name, op in (("actual", actual), ("ideal", ideal),
                             ("bf16", bf16)):
                t = bench_scan(op)
                rec[name + "_us"] = round(t * 1e6, 1)
                rec[name + "_tflops"] = round(2 * M * N * K / t / 1e12, 2)
            rec["speedup_vs_bf16"] = round(
                rec["bf16_us"] / rec["actual_us"], 3)
            results.append(rec)
            print(json.dumps(rec), flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
