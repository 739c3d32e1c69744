"""On-TPU probe: quantize-kernel tile shapes at M=2048 (dev tool)."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from qutlass_tpu.kernels import quantize as KQ
    from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)

    M, K = 2048, 5120
    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    p = {"a": a}

    orig = KQ.quantize_tiles
    for bm, bk in ((256, 2560), (256, 1024), (256, 512), (128, 1280),
                   (512, 1280)):
        KQ.quantize_tiles = lambda rows, k, _bm=bm, _bk=bk: (_bm, _bk)
        KQ.fused_quantize_mx.clear_cache()

        def quant(d, p):
            return KQ.fused_quantize_mx(chain_dep(p["a"], d), h, rot_size=32,
                                        method="quest", layout="kmajor")[0]

        try:
            t = benchmark(quant, iters=4, chain=4, params=p)
            print(f"bm={bm:4d} bk={bk:5d}: {t*1e6:7.1f}us", flush=True)
        except Exception as e:
            print(f"bm={bm:4d} bk={bk:5d}: FAIL {str(e)[:90]}", flush=True)
    KQ.quantize_tiles = orig


if __name__ == "__main__":
    main()
