"""Round-4 explicit M-chunk pipelining experiment (VERDICT r3 item 2).

The composed large-M linear = Pallas oneshot quantize + XLA int8 dot,
back-to-back (~73% of the pure-dot envelope at M=2048 K=N=5120).  The
r3 experiments only tried single-jit XLA composition; VERDICT asks for
explicit M-chunk software pipelining: quantize chunk i+1 overlapping
the dot of chunk i.  Variants measured here:

  C1  single jit, unrolled M-chunks (quantize c, dot c) x nchunks —
      exposes whatever cross-chunk overlap XLA's scheduler finds
      between the opaque custom call and the dot
  C2  single jit, software-pipelined order: quantize ALL chunks first,
      then all dots (maximal scheduling freedom, same dependencies)
  C3  separate host dispatches per chunk (async): dispatch quantize(0),
      then for i: dispatch dot(i) and quantize(i+1) without blocking —
      tests whether the runtime pipelines queued programs
  C0  production composed (no chunking), the baseline

TPU context: a v5e chip executes ONE program op at a time (fusion is
the only VPU/MXU co-scheduling, and custom calls don't fuse), so the
expectation is no win — this experiment exists to measure that fact
rather than assume it.

Usage: python benchmarks/exp_mpipe_r4.py [--M 2048] [--chunks 2,4]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--K", type=int, default=5120)
    ap.add_argument("--N", type=int, default=5120)
    ap.add_argument("--chunks", default="2,4")
    args = ap.parse_args()
    M, K, N = args.M, args.K, args.N

    from qutlass_tpu.ops import dispatch, int8path as I8
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep, tflops

    assert dispatch.on_tpu()
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    nw = 4
    wi8s, wsbs = [], []
    for i in range(nw):
        w = (jax.random.normal(jax.random.PRNGKey(i), (N, K),
                               jnp.bfloat16) * 0.05)
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wi8, wsb, _ = I8.prepare_weight_int8(wqt, wst)
        wi8s.append(wi8)
        wsbs.append(wsb)
    del w
    a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
    params = {"a": a, "wi8": wi8s, "wsb": wsbs}

    def quant(x, hc=None):
        return P.fused_quantize_mx_int8(x, h if hc is None else hc,
                                        rot_size=32, method="quest")

    def dot(ai, sa, j, p=None):
        # weights via params where available: closure-captured arrays
        # embed as constants in the compile request (105 MB here) and
        # measured 28x slower through the remote runtime
        ws, bs = (wi8s, wsbs) if p is None else (p["wi8"], p["wsb"])
        return I8.matmul_mxf4_bf16_int8_kmajor(
            ai, ws[j % nw], sa, bs[j % nw], one)

    # C0: production composed (dep chained through the 2 KB Hadamard:
    # chaining through x pays an unfusable full copy per iteration,
    # exp_longm_r4)
    def c0(d, j, p):
        hc = chain_dep(h, d)
        ai, sa, _ = quant(p["a"], hc)
        return dot(ai, sa, j, p)

    t0 = benchmark(c0, iters=4, chain=4, repeats=3, params=params)
    print(f"C0 composed      M={M}: {t0*1e6:8.1f}us "
          f"({tflops(M, N, K, t0):6.1f} TF/s)", flush=True)

    for nc in [int(c) for c in args.chunks.split(",")]:
        mc = M // nc

        def c1(d, j, p, nc=nc, mc=mc):
            hc = chain_dep(h, d)
            outs = []
            for c in range(nc):
                ai, sa, _ = quant(p["a"][c * mc:(c + 1) * mc], hc)
                outs.append(dot(ai, sa, j, p))
            return jnp.concatenate(outs, axis=0)

        def c2(d, j, p, nc=nc, mc=mc):
            hc = chain_dep(h, d)
            qs = [quant(p["a"][c * mc:(c + 1) * mc], hc)
                  for c in range(nc)]
            return jnp.concatenate(
                [dot(ai, sa, j, p) for ai, sa, _ in qs], axis=0)

        t1 = benchmark(c1, iters=4, chain=4, repeats=3, params=params)
        t2 = benchmark(c2, iters=4, chain=4, repeats=3, params=params)
        print(f"C1 interleaved  nc={nc}: {t1*1e6:8.1f}us "
              f"({tflops(M, N, K, t1):6.1f})   "
              f"C2 q-first nc={nc}: {t2*1e6:8.1f}us "
              f"({tflops(M, N, K, t2):6.1f})", flush=True)

    # C3: separate dispatches, host-async. Through this tunnel a
    # dispatch costs a fixed ~30 ms (CLAUDE.md) while a chunk's device
    # work is ~100 us, so cross-dispatch overlap is UNMEASURABLE here;
    # what CAN be measured is the per-dispatch wall cost of an async
    # train (does the tunnel pipeline queued programs at all?).  Every
    # input is distinct (the remote runtime caches executions by input
    # value; a repeated input returns in ~0.1 ms and corrupts slopes).
    qj = jax.jit(quant)
    dj = jax.jit(dot, static_argnums=(2,))
    nc = 4
    mc = M // nc
    rounds_max = 12
    xs = [[a[c * mc:(c + 1) * mc] + (0.001 * (r * nc + c + 1))
           for c in range(nc)] for r in range(rounds_max)]
    ai, sa, _ = qj(xs[0][0])
    np.asarray(dj(ai, sa, 0))  # warm both programs

    def train(rounds):
        outs = []
        for r in range(rounds):
            for c in range(nc):
                ai, sa, _ = qj(xs[r][c])
                outs.append(dj(ai, sa, c))
        # fetch one element of the last output: device order forces
        # all earlier programs to have completed
        return float(outs[-1][0, 0])

    train(2)  # warm
    t_start = time.time()
    train(3)
    t3 = time.time() - t_start
    t_start = time.time()
    train(rounds_max)
    t12 = time.time() - t_start
    per_dispatch = (t12 - t3) / ((rounds_max - 3) * 2 * nc)
    print(f"C3 async dispatch train nc={nc}: {per_dispatch*1e3:7.1f} "
          f"ms/dispatch wall (device work per dispatch ~"
          f"{t0/(2*nc)*1e3:.2f} ms) — cross-dispatch pipelining "
          f"{'amortizes below' if per_dispatch < 0.020 else 'is bounded by'}"
          f" the ~30 ms tunnel dispatch cost", flush=True)


if __name__ == "__main__":
    main()
