"""Quantize-kernel stage breakdown on TPU (dev tool).

Times the full kmajor quantize against stripped variants to locate the
cost: (a) rotate+transpose only, (b) + stats/scale, (c) full encode.
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
    from qutlass_tpu.kernels.quantize import _h128, _rotate_tile
    from qutlass_tpu.kernels.tuning import quantize_tiles
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

    def variant_kernel(x_ref, h_ref, q_ref, s_ref, *, stage):
        bm, bk = x_ref.shape
        xh = _rotate_tile(x_ref[...], h_ref[...])
        xt = xh.T
        if stage == "rot":
            q_ref[...] = xt[: bk // 2].astype(jnp.int32).astype(jnp.uint8)
            s_ref[...] = xt[: bk // 32].astype(jnp.int32).astype(jnp.uint8)
            return
        g = xt.reshape(bk // 32, 32, bm)
        s1 = jnp.sum(g, axis=1)
        s2 = jnp.sum(g * g, axis=1)
        scale = C.mx_scale_quest(s1, s2, 32.0)
        _, byte = C.pow2_floor_e8m0(scale)
        if stage == "stats":
            q_ref[...] = xt[: bk // 2].astype(jnp.int32).astype(jnp.uint8)
            s_ref[...] = byte.astype(jnp.uint8)
            return
        inv = C.e8m0_recip_f32(byte)
        q = (g * inv[:, None, :]).reshape(bk, bm)
        codes = C.e2m1_rtne_codes(q)
        if stage == "codes":
            q_ref[...] = codes[: bk // 2].astype(jnp.uint8)
            s_ref[...] = byte.astype(jnp.uint8)
            return
        from qutlass_tpu.kernels.quantize import _pack_sublane_pairs
        q_ref[...] = _pack_sublane_pairs(codes)
        s_ref[...] = byte.astype(jnp.uint8)

    def run_variant(stage):
        rows, k = M, K
        bm, bk = quantize_tiles(rows, k)
        grid = (ceil_div(rows, bm), k // bk)
        f = pl.pallas_call(
            functools.partial(variant_kernel, stage=stage),
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
                jax.ShapeDtypeStruct((k // 2, rows), jnp.uint8),
                jax.ShapeDtypeStruct((k // 32, rows), jnp.uint8),
            ],
        )
        return jax.jit(lambda x: f(x, _h128(h, 32))[0])

    for stage in ("rot", "stats", "codes", "full"):
        fn = run_variant(stage)
        t = benchmark(lambda d, fn=fn: fn(chain_dep(a, d)))
        print(f"stage={stage:6s}: {t*1e6:8.1f} us", flush=True)

    def prod(d):
        return P.fused_quantize_mx(chain_dep(a, d), h, rot_size=32,
                                   method="quest", layout="kmajor")[0]

    t = benchmark(prod)
    print(f"production kmajor quantize: {t*1e6:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
