"""End-to-end verify drive: package boundary vs fp64 golden on device.

Exercises quantize (MX/NV, rowmajor+kmajor) -> GEMMs (mxf4/nvf4,
tn+kmajor+fused) -> QAT backward flow against qutlass_tpu.formats.golden.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import qutlass_tpu as q
    from qutlass_tpu.formats import golden as G
    from qutlass_tpu.profiling import enable_compile_cache

    enable_compile_cache()
    print("platform", jax.default_backend(), jax.devices()[0].device_kind,
          flush=True)

    hm = np.array([[1.0]])
    while hm.shape[0] < 32:
        hm = np.block([[hm, hm], [hm, -hm]])
    h32 = jnp.asarray(hm * 32 ** -0.5, jnp.bfloat16)
    rng = np.random.default_rng(7)
    M, N, K = 260, 384, 1024
    x = jnp.asarray((rng.standard_normal((M, K)) * 25).astype(ml_dtypes.bfloat16))
    w = jnp.asarray((rng.standard_normal((N, K)) * 2).astype(ml_dtypes.bfloat16))
    one = jnp.asarray([1.0], jnp.float32)

    x64 = np.asarray(x, np.float64)
    w64 = np.asarray(w, np.float64)
    h64 = np.asarray(h32, np.float64)

    # --- MX quantize vs golden ---
    xq, xs = q.fusedQuantizeMx(x, h32, method="quest")
    ref = G.quantize_mx(x64, h64, 32, "quest")
    assert np.array_equal(np.asarray(xs)[:M, :K // 32], ref["e8m0"]), "mx scales"
    mism = np.mean(np.asarray(xq) != ref["e2m1"])
    assert mism <= 1e-4, f"mx packed mismatch {mism}"
    wq, ws = q.fusedQuantizeMx(w, h32, method="quest")
    wref = G.quantize_mx(w64, h64, 32, "quest")

    # --- mxf4 GEMM bit-exact vs fp64 dequant matmul ---
    y = q.matmul_mxf4_bf16_tn(xq, wq, q.to_blocked(xs), q.to_blocked(ws), one)
    a64 = G.dq_fp4(np.asarray(xq), np.asarray(xs)[:M, :K // 32], 32, 1.0)
    b64 = G.dq_fp4(np.asarray(wq), np.asarray(ws)[:N, :K // 32], 32, 1.0)
    want = (a64 @ b64.T).astype(ml_dtypes.bfloat16)
    got = np.asarray(y).astype(ml_dtypes.bfloat16)
    assert np.array_equal(got, want), \
        f"mxf4 gemm mismatch {np.mean(got != want)}"

    # --- kmajor fast path agrees with rowmajor ---
    xqt, xst = q.fusedQuantizeMx(x, h32, method="quest", layout="kmajor")
    wqt, wst = q.fusedQuantizeMx(w, h32, method="quest", layout="kmajor")
    yk = q.matmul_mxf4_bf16_kmajor(xqt, wqt, xst, wst, one)
    assert np.array_equal(np.asarray(yk), np.asarray(y)), "kmajor != tn"

    # --- fused linear agrees with composed path ---
    yf = q.fused_linear_mxf4(x, wqt, wst, h32, one)
    assert np.array_equal(np.asarray(yf), np.asarray(y)), "fused != composed"

    # --- NV quantize + GEMM (abs_max, global scale) ---
    gs = jnp.asarray([4.0], jnp.float32)
    nq, ns = q.fusedQuantizeNv(x, h32, gs, method="abs_max")
    nref = G.quantize_nv(x64, h64, 32, 4.0, "abs_max")
    assert np.array_equal(np.asarray(ns)[:M, :K // 16], nref["e4m3"]), "nv scales"
    nqw, nsw = q.fusedQuantizeNv(w, h32, gs, method="abs_max")
    alpha = jnp.asarray([1.0 / 16.0], jnp.float32)
    yn = q.matmul_nvf4_bf16_tn(nq, nqw, q.to_blocked(ns), q.to_blocked(nsw),
                               alpha)
    def dq_nv(pk, sb):
        v = G.unpack_fp4(pk).reshape(pk.shape[0], -1, 16)
        return (v * G.e4m3_to_f64(sb)[..., None]).reshape(pk.shape[0], -1)

    an = dq_nv(np.asarray(nq), np.asarray(ns)[:M, :K // 16])
    bn = dq_nv(np.asarray(nqw), np.asarray(nsw)[:N, :K // 16])
    wantn = ((an @ bn.T) / 16.0).astype(ml_dtypes.bfloat16)
    gotn = np.asarray(yn).astype(ml_dtypes.bfloat16)
    assert np.array_equal(gotn, wantn), \
        f"nvf4 gemm mismatch {np.mean(gotn != wantn)}"

    # --- NV kmajor + fused linear agree with composed ---
    nqt, nst = q.fusedQuantizeNv(x, h32, gs, method="abs_max",
                                 layout="kmajor")
    nqwt, nswt = q.fusedQuantizeNv(w, h32, gs, method="abs_max",
                                   layout="kmajor")
    ynk = q.matmul_nvf4_bf16_kmajor(nqt, nqwt, nst, nswt, alpha)
    assert np.array_equal(np.asarray(ynk), np.asarray(yn)), "nv kmajor != tn"
    ynf = q.fused_linear_nvf4(x, nqwt, nswt, h32, gs, alpha)
    assert np.array_equal(np.asarray(ynf), np.asarray(yn)), "nv fused != composed"

    # --- QAT backward flow: full custom_vjp (square-double fp8,
    # fp4->fp8 transpose, TN+NN fp8 GEMMs, clip-mask STE) via jax.grad ---
    from qutlass_tpu.nn import quartet_linear

    def loss(xx, ww):
        return jnp.sum(quartet_linear(xx, ww, h32, "quest"
                                      ).astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss, (0, 1))(x * 0.05, w)
    assert np.isfinite(np.asarray(gx, np.float32)).all(), "dgrad NaN"
    assert np.isfinite(np.asarray(gw, np.float32)).all(), "wgrad NaN"
    assert float(jnp.abs(gx.astype(jnp.float32)).sum()) > 0, "dgrad zero"

    print("verify_drive: ALL CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
