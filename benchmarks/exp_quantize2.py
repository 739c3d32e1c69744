"""Quantize-kernel structure probes at M=2048 (dev tool).

Variants (all checked bit-identical to production before timing):
  prod      — current production kmajor quantize
  blockfuse — per-128-row-block fused rotate->stats->encode->pack loop
              (no [bk, bm] f32 concatenate)
  dotgen    — blockfuse but rotation via dot_general contracting the
              lane dim of x directly (no explicit bf16 transpose)
  tiles     — production with alternative (bm, bk)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import ml_dtypes
    from qutlass_tpu.formats import codecs as C
    from qutlass_tpu.kernels import quantize as KQ
    from qutlass_tpu.kernels.quantize import _h128, _pack_sublane_pairs
    from qutlass_tpu.ops import pallas_ops as P
    from qutlass_tpu.profiling import benchmark, chain_dep, enable_compile_cache
    from qutlass_tpu.utils import ceil_div

    enable_compile_cache()
    print("device", jax.devices()[0].device_kind, flush=True)

    rng = np.random.default_rng(0)
    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)

    M, K = 2048, 5120
    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))

    def blockfuse_kernel(x_ref, h_ref, q_ref, s_ref, *, dotgen):
        bm, bk = x_ref.shape
        hT = h_ref[...].T
        if not dotgen:
            xt = x_ref[...].T
        for g in range(bk // 128):
            if dotgen:
                xg = jax.lax.dot_general(
                    h_ref[...], x_ref[:, g * 128:(g + 1) * 128],
                    (((0,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                xg = jnp.dot(hT, xt[g * 128:(g + 1) * 128],
                             preferred_element_type=jnp.float32)
            gg = xg.reshape(4, 32, bm)
            s1 = jnp.sum(gg, axis=1)
            s2 = jnp.sum(gg * gg, axis=1)
            scale = C.mx_scale_quest(s1, s2, 32.0)
            _, byte = C.pow2_floor_e8m0(scale)
            inv = C.e8m0_recip_f32(byte)
            q = (gg * inv[:, None, :]).reshape(128, bm)
            codes = C.e2m1_rtne_codes(q)
            q_ref[g * 64:(g + 1) * 64] = _pack_sublane_pairs(codes)
            s_ref[g * 4:(g + 1) * 4] = byte.astype(jnp.uint8)

    def run_blockfuse(dotgen, bm, bk):
        grid = (ceil_div(M, bm), K // bk)
        f = pl.pallas_call(
            functools.partial(blockfuse_kernel, dotgen=dotgen),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bk // 2, bm), lambda i, j: (j, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk // 32, bm), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K // 2, M), jnp.uint8),
                jax.ShapeDtypeStruct((K // 32, M), jnp.uint8),
            ],
        )
        return jax.jit(lambda x: f(x, _h128(h, 32)))

    ref_q, ref_s = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")
    ref_q, ref_s = np.asarray(ref_q), np.asarray(ref_s)

    def prod(d):
        return P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                   method="quest", layout="kmajor")[0]

    t = benchmark(prod)
    print(f"prod (current tiles):        {t*1e6:8.1f} us", flush=True)

    for name, dotgen, bm, bk in (("blockfuse", False, 128, 2560),
                                 ("dotgen", True, 128, 2560),
                                 ("blockfuse", False, 256, 1280),
                                 ("dotgen", True, 256, 1280),
                                 ("blockfuse", False, 512, 640),
                                 ("dotgen", True, 512, 1280),
                                 ("blockfuse", False, 256, 2560),
                                 ("blockfuse", False, 1024, 256)):
        try:
            fn = run_blockfuse(dotgen, bm, bk)
            q, s = fn(a)
            ok = (np.array_equal(np.asarray(q), ref_q)
                  and np.array_equal(np.asarray(s), ref_s))
            t = benchmark(lambda d, fn=fn: fn(chain_dep(a, d))[0])
            print(f"{name:9s} bm={bm:4d} bk={bk:5d}: {t*1e6:8.1f} us  "
                  f"{'exact' if ok else 'MISMATCH'}", flush=True)
        except Exception as e:
            print(f"{name:9s} bm={bm:4d} bk={bk:5d}: FAIL {str(e)[:110]}",
                  flush=True)

    # production at alternative tiles, cheap-encode era re-sweep
    orig = KQ.quantize_tiles
    for bm, bk in ((256, 1280), (256, 640), (512, 640), (64, 2560),
                   (128, 1280)):
        KQ.quantize_tiles = lambda rows, k, _t=(bm, bk): _t
        KQ.fused_quantize_mx.clear_cache()
        try:
            t = benchmark(prod)
            print(f"prod      bm={bm:4d} bk={bk:5d}: {t*1e6:8.1f} us",
                  flush=True)
        except Exception as e:
            print(f"prod      bm={bm:4d} bk={bk:5d}: FAIL {str(e)[:110]}",
                  flush=True)
    KQ.quantize_tiles = orig


if __name__ == "__main__":
    main()
