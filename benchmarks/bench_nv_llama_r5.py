"""NVFP4 production-path line over the Llama-3.1-70B layer table.

Extends the headline NV evidence (bench.py measures the qwen3-32b
table) to the second reference table — same protocol: fused NV
quantize+int8-encode -> int8-MXU GEMM vs the bf16 linear, slope-timed
chained-scan harness, dep chained through the Hadamard.
Reference: bench_nvfp4_sm120.py:161-188 (NVFP4 as a first-class format
at every geometry).

Usage: python benchmarks/bench_nv_llama_r5.py [--table llama31-70b]
       [--ms 16 256 2048]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

TABLES = {
    "qwen3-32b": [(5120, 5120), (5120, 51200), (25600, 5120)],
    "llama31-70b": [(8192, 8192), (8192, 57344), (28672, 8192)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default="llama31-70b", choices=list(TABLES))
    ap.add_argument("--ms", type=int, nargs="*", default=[16, 256, 2048])
    args = ap.parse_args()
    GEOS, MS, table = TABLES[args.table], args.ms, args.table
    from qutlass_tpu.ops import int8path as I8
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep

    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)
    gs = jnp.float32(6.0)
    speeds = []

    for K, N in GEOS:
        nw = 4
        nvi8s, nvsbs, wTs = [], [], []
        for i in range(nw):
            w = (jax.random.normal(jax.random.PRNGKey(99 + i), (N, K),
                                   jnp.bfloat16) * 0.05)
            wqt, wst = P.fused_quantize_nv(w, h, gs, rot_size=32,
                                           layout="kmajor")
            ni, nsb = I8.prepare_weight_nv_int8(wqt, wst)
            nvi8s.append(ni)
            nvsbs.append(nsb)
            wTs.append(w.T)
        del w
        for M in MS:
            a = jax.random.normal(jax.random.PRNGKey(M), (M, K),
                                  jnp.bfloat16)
            p = {"nvi8": nvi8s, "nvsb": nvsbs, "wT": wTs, "a": a}

            def nv_linear(d, j, pp):
                hc = chain_dep(h, d)
                xi, sx, _ = P.fused_quantize_nv_int8(pp["a"], hc, gs,
                                                     rot_size=32)
                return I8.matmul_mxf4_bf16_int8_kk(
                    xi, pp["nvi8"][j % nw], sx, pp["nvsb"][j % nw], one)

            def bf16_linear(d, j, pp):
                return chain_dep(pp["a"], d) @ pp["wT"][j % nw]

            tq = benchmark(nv_linear, repeats=3, params=p)
            tb = benchmark(bf16_linear, repeats=3, params=p)
            speeds.append(tb / tq)
            print(f"NVFP4 {table} K={K:5d} N={N:5d} M={M:5d}: "
                  f"int8-path {tq*1e6:9.1f}us "
                  f"({2*M*N*K/tq/1e12:6.2f} TF/s) "
                  f"bf16 {tb*1e6:9.1f}us  speedup {tb/tq:5.2f}x",
                  flush=True)
    g = float(np.exp(np.mean(np.log(speeds))))
    print(json.dumps({"metric": f"nvfp4_{table}_speedup_geomean",
                      "value": round(g, 4), "points": len(speeds)}),
          flush=True)


if __name__ == "__main__":
    main()
