"""On-TPU probe: K-deep GEMM tiles (accumulator-traffic hypothesis).

acc[...] += dot(...) moves bm*bn*8 bytes of VMEM per K step; total
M*N*8*(K/bk) regardless of bn.  bk=512/1024 halves/quarters it.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.kernels import gemm as KG
    from qutlass_tpu.profiling import (benchmark, chain_dep, tflops,
                                       enable_compile_cache)
    from qutlass_tpu.ops import pallas_ops as P

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    one = jnp.ones((1,), jnp.float32)

    N, K = 5120, 5120
    w = jnp.asarray((rng.standard_normal((N, K)) * 0.05).astype(ml_dtypes.bfloat16))
    wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    ref = {}
    orig = KG.gemm_tiles
    shapes = [(256, 5120, 256), (256, 2560, 512), (256, 5120, 512),
              (256, 2560, 1024), (256, 1280, 2560), (256, 1280, 1024),
              (512, 2560, 512)]
    for M in [256, 1024, 2048]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")
        for bm, bn, bk in shapes:
            if bm > M:
                continue
            KG.gemm_tiles = lambda m, n, k, packed, _t=(bm, bn, bk): _t
            KG.matmul_mxf4_bf16_kmajor.clear_cache()

            def gemm_only(d):
                return KG.matmul_mxf4_bf16_kmajor(chain_dep(aqt, d), wqt,
                                                  ast, wst, one)

            try:
                out = np.asarray(gemm_only(jnp.zeros((), jnp.bfloat16)))
                if M in ref:
                    assert np.array_equal(out, ref[M]), "MISMATCH"
                else:
                    ref[M] = out
                t = benchmark(gemm_only)
                print(f"M={M:5d} bm={bm:5d} bn={bn:5d} bk={bk:4d}: "
                      f"{t*1e6:8.1f}us ({tflops(M,N,K,t):6.1f}TF)",
                      flush=True)
            except Exception as e:
                print(f"M={M:5d} bm={bm:5d} bn={bn:5d} bk={bk:4d}: FAIL "
                      f"{str(e)[:100]}", flush=True)
    KG.gemm_tiles = orig


if __name__ == "__main__":
    main()
