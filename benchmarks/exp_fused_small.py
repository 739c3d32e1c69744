"""On-TPU probe: fused v2 vs composed at decode sizes (dev tool)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    N, K = 5120, 5120
    NW = 4
    wqts, wsts, wTs = [], [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
        wTs.append(w.T)
    del w

    for M in [64, 2048]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        p = {"wqt": wqts, "wst": wsts, "wT": wTs, "a": a}

        def fused(d, j, p):
            return P.fused_linear_mxf4(chain_dep(p["a"], d), p["wqt"][j % NW],
                                       p["wst"][j % NW], h, one, rot_size=32)

        def composed(d, j, p):
            x = chain_dep(p["a"], d)
            xq, xs = P.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                         layout="kmajor")
            return P.matmul_mxf4_bf16_kmajor(xq, p["wqt"][j % NW], xs,
                                             p["wst"][j % NW], one)

        def bf16(d, j, p):
            return chain_dep(p["a"], d) @ p["wT"][j % NW]

        tf = benchmark(fused, params=p)
        tc = benchmark(composed, params=p)
        tb = benchmark(bf16, params=p)
        print(f"M={M:4d} fused {tf*1e6:7.1f}us composed {tc*1e6:7.1f}us "
              f"bf16 {tb*1e6:7.1f}us  best-speedup {tb/min(tf,tc):5.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
