"""On-TPU probe: GEMM N-tile width at decode sizes (dev tool).

Monkeypatches the tile table to compare bn in {1024, 2560, 5120} at
M in {16, 64} — fewer, wider programs vs the default."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.kernels import gemm as KG
    from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    from qutlass_tpu.ops import pallas_ops as P
    N, K = 5120, 5120
    NW = 4
    wqts, wsts = [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
    del w

    orig = KG.gemm_tiles
    for M in (2048,):
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")
        p = {"wqt": wqts, "wst": wsts, "aqt": aqt, "ast": ast}
        for bm_, bn, bk in ((512, 2560, 256), (256, 5120, 512), (128, 5120, 256)):
            KG.gemm_tiles = lambda m, n, k, packed, _bm=bm_, _bn=bn, _bk=bk: (
                min(m, _bm), _bn, _bk)
            KG.matmul_mxf4_bf16_kmajor.clear_cache()

            def gemm(d, j, p):
                return KG.matmul_mxf4_bf16_kmajor(
                    chain_dep(p["aqt"], d), p["wqt"][j % NW], p["ast"],
                    p["wst"][j % NW], one)

            try:
                t = benchmark(gemm, iters=4, chain=4, params=p)
                print(f"M={M:3d} bm={bm_:4d} bn={bn:5d} bk={bk:5d}: {t*1e6:7.1f}us",
                      flush=True)
            except Exception as e:
                print(f"M={M:3d} bm={bm_:4d} bn={bn:5d} bk={bk:5d}: FAIL "
                      f"{str(e)[:90]}", flush=True)
    KG.gemm_tiles = orig


if __name__ == "__main__":
    main()
