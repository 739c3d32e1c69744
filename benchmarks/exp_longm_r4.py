"""Round-4 large-M investigation (VERDICT r3 item 2).

Two questions:
  (a) does the PURE int8 dot envelope itself decay at M >= 8192 (the r3
      354 TF/s envelope was measured at M=2048), i.e. is the composed
      64.9%-of-envelope at M=65536 actually a high fraction of what the
      dot alone achieves there?
  (b) per-M anatomy: standalone fused quantize, dot+fixup with
      pre-encoded operands, and the composed linear — how much overlap
      XLA finds, and where the gap sits.

Usage: python benchmarks/exp_longm_r4.py [--ms 2048,8192,65536]
"""
import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", default="2048,8192,65536")
    ap.add_argument("--K", type=int, default=5120)
    ap.add_argument("--N", type=int, default=5120)
    args = ap.parse_args()
    ms = [int(m) for m in args.ms.split(",")]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from qutlass_tpu.ops import dispatch, int8path as I8
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep, tflops

    assert dispatch.on_tpu()
    K, N = args.K, args.N
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

    for M in ms:
        a = jax.random.normal(jax.random.PRNGKey(M), (M, K), jnp.bfloat16)
        # pre-encoded activation (for the pure dot / dot+fixup)
        ai0, sa0, _ = P.fused_quantize_mx_int8(a, h, rot_size=32,
                                               method="quest")
        pre = {"ai": ai0, "sa": sa0, "wi8": wi8s, "wsb": wsbs}
        comp = {"a": a, "wi8": wi8s, "wsb": wsbs}
        it, ch = (4, 4) if M <= 8192 else (2, 2)

        def pure_dot(d, j, p):
            ai = chain_dep(p["ai"], d)
            return jax.lax.dot_general(
                ai, p["wi8"][j % nw], (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        def dot_fixup(d, j, p):
            ai = chain_dep(p["ai"], d)
            return I8.matmul_mxf4_bf16_int8_kmajor(
                ai, p["wi8"][j % nw], p["sa"], p["wsb"][j % nw], one)

        def quant_only(d, j, p):
            x = chain_dep(p["a"], d)
            ai, sa, _ = P.fused_quantize_mx_int8(x, h, rot_size=32,
                                                 method="quest")
            return ai

        # chain the dep through the TINY Hadamard operand instead of x:
        # chain_dep's elementwise max cannot fuse into the Pallas custom
        # call, so chaining through x pays a full extra read+write copy
        # of the activation every iteration (2 x 2*M*K bytes — 1.6 ms at
        # M=65536) that a real pipeline (activation produced on-device)
        # never pays.  h' = max(h, -3e38) keeps the quantize un-hoistable
        # at 2 KB of traffic.
        def quant_only_hchain(d, j, p):
            hc = chain_dep(h, d)
            ai, sa, _ = P.fused_quantize_mx_int8(p["a"], hc, rot_size=32,
                                                 method="quest")
            return ai

        def composed(d, j, p):
            x = chain_dep(p["a"], d)
            ai, sa, _ = P.fused_quantize_mx_int8(x, h, rot_size=32,
                                                 method="quest")
            return I8.matmul_mxf4_bf16_int8_kmajor(
                ai, p["wi8"][j % nw], sa, p["wsb"][j % nw], one)

        def composed_hchain(d, j, p):
            hc = chain_dep(h, d)
            ai, sa, _ = P.fused_quantize_mx_int8(p["a"], hc, rot_size=32,
                                                 method="quest")
            return I8.matmul_mxf4_bf16_int8_kmajor(
                ai, p["wi8"][j % nw], sa, p["wsb"][j % nw], one)

        tdot = benchmark(pure_dot, iters=it, chain=ch, repeats=3, params=pre)
        tfix = benchmark(dot_fixup, iters=it, chain=ch, repeats=3, params=pre)
        tq = benchmark(quant_only, iters=it, chain=ch, repeats=3, params=comp)
        tqh = benchmark(quant_only_hchain, iters=it, chain=ch, repeats=3,
                        params=comp)
        tc = benchmark(composed, iters=it, chain=ch, repeats=3, params=comp)
        tch = benchmark(composed_hchain, iters=it, chain=ch, repeats=3,
                        params=comp)
        print(f"M={M:6d}: pure-dot {tdot*1e6:9.1f}us ({tflops(M,N,K,tdot):6.1f} TF/s)  "
              f"dot+fixup {tfix*1e6:9.1f}us ({tflops(M,N,K,tfix):6.1f})  "
              f"quant {tq*1e6:8.1f}us  quant-hchain {tqh*1e6:8.1f}us  "
              f"composed {tc*1e6:9.1f}us ({tflops(M,N,K,tc):6.1f})  "
              f"composed-hchain {tch*1e6:9.1f}us ({tflops(M,N,K,tch):6.1f}) "
              f"comp-h/dot {tch/tdot:5.2f}", flush=True)


if __name__ == "__main__":
    main()
