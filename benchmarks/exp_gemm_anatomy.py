"""On-TPU probe: anatomy of the large-M GEMM gap vs bf16.

At M=2048 the kmajor GEMM runs ~631 us vs ~545 us MXU-bound.  Tile and
decode-count sweeps were all neutral-or-worse (exp_gemmtiles*), so the
gap is NOT explained by decode redundancy or HBM traffic.  Remaining
suspects, isolated here with timing-only kernel variants (numerics
intentionally wrong for the fakes; only the baseline checks results):

  base       the production kernel (SWAR decode, 16 ops/byte)
  fake       ~4-op/byte fake decode, identical shapes/DMA/acc
  bf16skel   same skeleton fed pre-decoded bf16 operands (2x DMA, 0 decode)
  accow      baseline decode but acc overwrite (no RMW read)

fake vs base   = VPU decode cost not hidden under the MXU
bf16skel       = skeleton floor (grid overhead + DMA + acc + MXU)
accow vs base  = accumulator read-modify-write share
"""
import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
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
    M = 2048
    NW = 4
    wqts, wsts, wbts = [], [], []
    for _ in range(NW):
        w = jnp.asarray((rng.standard_normal((N, K)) * 0.05
                         ).astype(ml_dtypes.bfloat16))
        wqt, wst = P.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                       layout="kmajor")
        wqts.append(wqt)
        wsts.append(wst)
        wbts.append(jnp.asarray(w).T.astype(jnp.bfloat16))  # [K, N]
    params = {"wqt": wqts, "wst": wsts, "wbt": wbts}

    a = jnp.asarray(rng.standard_normal((M, K)).astype(ml_dtypes.bfloat16))
    aqt, ast = P.fused_quantize_mx(a, h, rot_size=32, method="quest",
                                   layout="kmajor")
    abt = jnp.asarray(np.asarray(a)).T.astype(jnp.bfloat16)  # [K, M]

    def fake_dq(pk, sf):
        # same input refs/traffic, ~4 ops per packed byte, nonzero bf16 out
        v = pk[...].astype(jnp.int32)
        c = v | (v << 12)
        bits = (c & 0x70007) << 8
        _ = sf[...]
        return pltpu.bitcast(pltpu.bitcast(bits, jnp.uint16), jnp.bfloat16)

    def kern_fake(alpha_ref, a_ref, b_ref, asf_ref, bsf_ref, o_ref, acc):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc[...] = jnp.zeros_like(acc)
        av = fake_dq(a_ref, asf_ref)
        bv = fake_dq(b_ref, bsf_ref)
        acc[...] += jax.lax.dot_general(av, bv, KG._KDIM,
                                        preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _fin():
            o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(jnp.bfloat16)

    def kern_bf16(alpha_ref, a_ref, b_ref, asf_ref, bsf_ref, o_ref, acc):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc[...] = jnp.zeros_like(acc)
        acc[...] += jax.lax.dot_general(a_ref[...], b_ref[...], KG._KDIM,
                                        preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _fin():
            o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(jnp.bfloat16)

    def kern_accow(alpha_ref, a_ref, b_ref, asf_ref, bsf_ref, o_ref, acc):
        av = KG._dequant_fp4_mx(a_ref, asf_ref)
        bv = KG._dequant_fp4_mx(b_ref, bsf_ref)
        acc[...] = jax.lax.dot_general(av, bv, KG._KDIM,
                                       preferred_element_type=jnp.float32)
        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _fin():
            o_ref[...] = (acc[...] * alpha_ref[0, 0]).astype(jnp.bfloat16)

    bk = 256

    @jax.jit
    def run_base(at, bt, asft, bsft):
        return KG._run_gemm(functools.partial(KG._gemm_fp4_kernel, fmt="mx"),
                            at, bt, asft, bsft, one, M, N, K, bk, bk // 32)

    @jax.jit
    def run_fake(at, bt, asft, bsft):
        return KG._run_gemm(kern_fake, at, bt, asft, bsft, one,
                            M, N, K, bk, bk // 32)

    @jax.jit
    def run_accow(at, bt, asft, bsft):
        return KG._run_gemm(kern_accow, at, bt, asft, bsft, one,
                            M, N, K, bk, bk // 32)

    @jax.jit
    def run_bf16skel(at, bt, asft, bsft):
        return KG._run_gemm(kern_bf16, at, bt, asft, bsft, one,
                            M, N, K, bk, bk // 32)

    cases = {
        "base": lambda d, j, p: run_base(chain_dep(aqt, d), p["wqt"][j % NW],
                                         ast, p["wst"][j % NW]),
        "fake": lambda d, j, p: run_fake(chain_dep(aqt, d), p["wqt"][j % NW],
                                         ast, p["wst"][j % NW]),
        "accow": lambda d, j, p: run_accow(chain_dep(aqt, d), p["wqt"][j % NW],
                                           ast, p["wst"][j % NW]),
        "bf16skel": lambda d, j, p: run_bf16skel(
            chain_dep(abt, d), p["wbt"][j % NW], ast, p["wst"][j % NW]),
        "bf16xla": lambda d, j, p: chain_dep(a, d) @ p["wbt"][j % NW],
    }
    for name, op in cases.items():
        try:
            np.asarray(op(jnp.zeros((), jnp.float32), 0, params))
            t = benchmark(op, params=params)
            print(f"M={M} {name:9s}: {t*1e6:7.1f}us ({tflops(M,N,K,t):5.1f}TF)",
                  flush=True)
        except Exception as e:
            print(f"M={M} {name:9s}: FAIL {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
