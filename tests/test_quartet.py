"""Quartet QAT backward-op tests (reference tests/quartet_test.py)."""
import ml_dtypes
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu.formats import golden as G
from helpers import bf16_hadamard, randn_bf16, to_np64


def test_quest_mask_bitexact():
    """quartet_test.py:184-205: scale/mask/dq exact equality vs golden."""
    rng = np.random.default_rng(0)
    l, n, k = 2, 512, 1024
    h = bf16_hadamard(32)
    x = randn_bf16(rng, l, n, k)

    ref = G.quantize_mx(to_np64(x), to_np64(h), 32, "quest")
    e2m1, e8m0, mask = q.fusedQuantizeMx(x, h, method="quest", return_mask=True)
    scales = np.asarray(e8m0)[:l * n, :k // 32].reshape(l, n, k // 32)
    np.testing.assert_array_equal(scales, ref["e8m0"])
    dq = G.dq_fp4(np.asarray(e2m1), scales, 32, 1.0)
    assert (dq != ref["dq"]).mean() <= 1e-4
    assert (G.unpack_mask(np.asarray(mask)) != ref["mask_bits"]).mean() <= 1e-5


def test_backward_t():
    """backward_t_bf16 vs golden transposed abs-max ref (quartet_test.py:220-226)."""
    rng = np.random.default_rng(0)
    l, n, k = 2, 512, 256
    h = bf16_hadamard(32)
    x = randn_bf16(rng, l, n, k)

    ref = G.backward_quantize(np.swapaxes(to_np64(x), -2, -1), to_np64(h))
    e2m1, e8m0 = q.backward_t_bf16(x, h)
    assert e2m1.shape == (l, k, n // 2)
    assert e8m0.shape == (l, k, n // 32)
    np.testing.assert_array_equal(np.asarray(e8m0), ref["e8m0"])
    dq = G.dq_fp4(np.asarray(e2m1), np.asarray(e8m0), 32, 3.0)
    assert (dq != ref["dq"]).mean() <= 1e-4


def test_backward_qt():
    """backward_qt_bf16 with alpha=3 (quartet_test.py:228-239)."""
    rng = np.random.default_rng(0)
    n, k = 512, 256
    h = bf16_hadamard(32)
    x = randn_bf16(rng, n, k)

    x_e2m1, x_e8m0 = q.fusedQuantizeMx(x, h, method="abs_max")
    x_e8m0c = np.asarray(x_e8m0)[:n, :k // 32]

    # golden: dequantize with alpha=3 in fp64, transpose, abs-max requantize
    xdq = G.dq_fp4(np.asarray(x_e2m1), x_e8m0c, 32, 3.0)
    ref = G.backward_quantize(xdq.T, to_np64(h))

    alpha = jnp.asarray([3.0], jnp.float32)
    e2m1, e8m0 = q.backward_qt_bf16(x_e2m1, jnp.asarray(x_e8m0c), h, alpha)
    assert e2m1.shape == (k, n // 2)
    assert e8m0.shape == (k, n // 32)
    np.testing.assert_array_equal(np.asarray(e8m0), ref["e8m0"])
    dq = G.dq_fp4(np.asarray(e2m1), np.asarray(e8m0), 32, 3.0)
    assert (dq != ref["dq"]).mean() <= 1e-4


def test_square_double_mxfp8():
    """backward_bf16_square_double_mxfp8 vs golden (quartet_test.py:369-378)."""
    m, n = 422, 256
    x64 = np.tile(np.arange(n, dtype=np.float64), (m, 1))
    x64 = x64.astype(ml_dtypes.bfloat16).astype(np.float64)
    x = jnp.asarray(x64, jnp.bfloat16)

    fp8, row_s, col_s = q.backward_bf16_square_double_mxfp8(x)
    x_pad = np.zeros((512, n))
    x_pad[:m] = x64
    ref_fp8, ref_row, ref_col = G.bf16_square_double_mxfp8(x_pad)

    np.testing.assert_array_equal(np.asarray(row_s), ref_row)
    np.testing.assert_array_equal(np.asarray(col_s), ref_col)
    got = np.asarray(fp8).view(ml_dtypes.float8_e4m3fn).astype(np.float64)
    exp = ref_fp8.view(ml_dtypes.float8_e4m3fn).astype(np.float64)
    assert (got != exp).mean() <= 1e-4


def test_mxfp4_transpose_mxfp8():
    """mxfp4_transpose_mxfp8 vs golden (quartet_test.py:380-385)."""
    rng = np.random.default_rng(0)
    m, n = 422, 256
    x64 = (rng.standard_normal((m, n)) * 25).astype(ml_dtypes.bfloat16)
    x = jnp.asarray(x64)

    eye = jnp.asarray(np.eye(32), jnp.bfloat16)
    fp4, scales = q.fusedQuantizeMx(x, eye, method="abs_max")
    fp8, sexps = q.mxfp4_transpose_mxfp8(fp4, scales)
    assert fp8.shape == (n, 512)
    assert sexps.shape == (n, 512 // 32)

    # golden: dequant (alpha=1: reference transpose kernel dequants without /3)
    sc = np.asarray(scales)[:m, :n // 32]
    x_pad_fp4 = np.zeros((512, n // 2), np.uint8)
    x_pad_fp4[:m] = np.asarray(fp4)
    sc_pad = np.full((512, n // 32), 127, np.uint8)
    sc_pad[:m] = sc
    xdq = G.dq_fp4(x_pad_fp4, sc_pad, 32, 1.0)          # [512, n] fp64
    xt = xdq.T                                           # [n, 512]
    g = xt.reshape(n, 512 // 32, 32)
    amax = np.abs(g).max(-1)
    with np.errstate(divide="ignore"):
        ref_e = np.where(amax > 0,
                         np.floor(np.log2(np.where(amax > 0, amax, 1.0))) - 7 + 127,
                         127).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(sexps), ref_e)
    scv = G.e8m0_to_f64(ref_e)
    q8 = (g / scv[..., None]).astype(ml_dtypes.bfloat16).astype(ml_dtypes.float8_e4m3fn)
    got = np.asarray(fp8).view(ml_dtypes.float8_e4m3fn).astype(np.float64)
    exp = q8.astype(np.float64).reshape(n, 512)
    assert (got != exp).mean() <= 1e-4


def test_backward_flow_nn_gemm():
    """End-to-end dgrad-style flow: double-quant + fp4 transpose + NN GEMM
    cross-check with cosine similarity vs bf16 (quartet_test.py:387-408)."""
    rng = np.random.default_rng(0)
    # m pads to 512 under both the 128 (double-quant) and 256 (fp4
    # transpose) padding rules, like the reference test's m=2694.
    m, n = 422, 256
    x64 = (rng.standard_normal((m, n)) * 5).astype(ml_dtypes.bfloat16)
    x = jnp.asarray(x64)

    a_fp8, a_row, a_col = q.backward_bf16_square_double_mxfp8(x)
    eye = jnp.asarray(np.eye(32), jnp.bfloat16)
    fp4, scales = q.fusedQuantizeMx(x, eye, method="abs_max")
    b_fp8, b_exps = q.mxfp4_transpose_mxfp8(fp4, scales)

    out = q.matmul_mxf8_bf16_nn(a_fp8, b_fp8, a_col, b_exps,
                                jnp.asarray([1.0], jnp.float32))
    ref = x64.astype(np.float64).T @ x64.astype(np.float64)
    got = np.asarray(out, np.float32)
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref) + 1e-30)
    assert cos > 0.99, cos


def test_square_double_scaled_matches_bytes():
    """Scaled-bf16 fast path == decode(public byte op) exactly."""
    rng = np.random.default_rng(3)
    m, n = 422, 256
    x = jnp.asarray((rng.standard_normal((m, n)) * 8).astype(ml_dtypes.bfloat16))

    fp8, row_s, _ = q.backward_bf16_square_double_mxfp8(x)
    want = (np.asarray(fp8).view(ml_dtypes.float8_e4m3fn).astype(np.float64)
            * np.repeat(G.e8m0_to_f64(np.asarray(row_s)), 32, axis=1)
            ).astype(ml_dtypes.bfloat16)
    got = np.asarray(q.backward_square_double_scaled(x))
    np.testing.assert_array_equal(got, want)


def test_mxfp4_transpose_scaled_matches_bytes():
    """Scaled-bf16 transpose fast path == decode(public byte op) exactly."""
    rng = np.random.default_rng(4)
    m, n = 422, 256
    x = jnp.asarray((rng.standard_normal((m, n)) * 25).astype(ml_dtypes.bfloat16))
    eye = jnp.asarray(np.eye(32), jnp.bfloat16)
    fp4, scales = q.fusedQuantizeMx(x, eye, method="abs_max")

    fp8, sexps = q.mxfp4_transpose_mxfp8(fp4, scales)
    want = (np.asarray(fp8).view(ml_dtypes.float8_e4m3fn).astype(np.float64)
            * np.repeat(G.e8m0_to_f64(np.asarray(sexps)), 32, axis=1)
            ).astype(ml_dtypes.bfloat16)
    got = np.asarray(q.mxfp4_transpose_scaled(fp4, scales))
    np.testing.assert_array_equal(got, want)
