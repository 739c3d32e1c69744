"""On-TPU probe: manual double-buffered K pipeline vs the auto grid.

The auto-pipelined grid at (256, N, 256) tiles runs 160 grid steps at
M=2048; fake-decode showed ~50 us of skeleton tax vs XLA's matmul.
This variant collapses the K dimension into an in-kernel fori_loop with
hand-rolled double-buffered DMAs (HBM -> VMEM scratch), so the whole
GEMM is M/bm grid steps.  Round-1's explicit pipelining regressed
because it round-tripped *decoded* tiles through VMEM; here only the
packed bytes are staged (as the auto pipeline already does) and decode
feeds the MXU directly.
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import ml_dtypes
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
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
    NW = 4
    wqts, wsts = [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
    params = {"wqt": wqts, "wst": wsts}

    def make(M, bm, bk):
        nk = K // bk
        bkh = bk // 2   # packed rows per chunk
        gsb = bk // 32  # scale rows per chunk

        def kern(alpha_ref, a_hbm, b_hbm, asf_hbm, bsf_hbm, o_ref,
                 acc, a_buf, b_buf, asf_buf, bsf_buf, sa, sb_, sas, sbs):
            i = pl.program_id(0)

            def dma(kk, slot):
                r = kk * bkh
                g = kk * gsb
                return (
                    pltpu.make_async_copy(
                        a_hbm.at[pl.ds(r, bkh), pl.ds(i * bm, bm)],
                        a_buf.at[slot], sa.at[slot]),
                    pltpu.make_async_copy(
                        b_hbm.at[pl.ds(r, bkh), :], b_buf.at[slot],
                        sb_.at[slot]),
                    pltpu.make_async_copy(
                        asf_hbm.at[pl.ds(g, gsb), pl.ds(i * bm, bm)],
                        asf_buf.at[slot], sas.at[slot]),
                    pltpu.make_async_copy(
                        bsf_hbm.at[pl.ds(g, gsb), :], bsf_buf.at[slot],
                        sbs.at[slot]),
                )

            for c in dma(0, 0):
                c.start()
            acc[...] = jnp.zeros_like(acc)

            def body(kk, _):
                slot = lax.rem(kk, 2)
                nxt = lax.rem(kk + 1, 2)

                @pl.when(kk + 1 < nk)
                def _():
                    for c in dma(kk + 1, nxt):
                        c.start()

                for c in dma(kk, slot):
                    c.wait()
                av = KG._dequant_fp4_mx(a_buf.at[slot], asf_buf.at[slot])
                bv = KG._dequant_fp4_mx(b_buf.at[slot], bsf_buf.at[slot])
                acc[...] += lax.dot_general(
                    av, bv, KG._KDIM, preferred_element_type=jnp.float32)
                return 0

            lax.fori_loop(0, nk, body, 0)
            o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(jnp.bfloat16)

        @jax.jit
        def run(at, bt, asft, bsft):
            return pl.pallas_call(
                kern,
                grid=(M // bm,),
                in_specs=[
                    pl.BlockSpec((1, 1), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec((bm, N), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
                scratch_shapes=[
                    pltpu.VMEM((bm, N), jnp.float32),
                    pltpu.VMEM((2, bkh, bm), jnp.uint8),
                    pltpu.VMEM((2, bkh, N), jnp.uint8),
                    pltpu.VMEM((2, gsb, bm), jnp.uint8),
                    pltpu.VMEM((2, gsb, N), jnp.uint8),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(jnp.asarray(one, jnp.float32).reshape(1, 1), at, bt, asft, bsft)
        return run

    for M in [2048, 1024, 256]:
        a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
        aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                       layout="kmajor")
        ref = np.asarray(KG.matmul_mxf4_bf16_kmajor(aqt, wqts[0], ast,
                                                    wsts[0], one))
        for bm, bk in [(256, 256), (256, 512), (min(M, 512), 256)]:
            try:
                run = make(M, bm, bk)

                def op(d, j, p, _r=run):
                    return _r(chain_dep(aqt, d), p["wqt"][j % NW], ast,
                              p["wst"][j % NW])

                out = np.asarray(op(jnp.zeros((), jnp.float32), 0, params))
                tag = "" if (bk == 256 and np.array_equal(out, ref)) else \
                    ("" if bk != 256 else " MISMATCH")
                t = benchmark(op, params=params)
                print(f"M={M:4d} manual bm={bm:4d} bk={bk:4d}: {t*1e6:7.1f}us "
                      f"({tflops(M,N,K,t):5.1f}TF){tag}", flush=True)
            except Exception as e:
                print(f"M={M:4d} manual bm={bm:4d} bk={bk:4d}: FAIL "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
