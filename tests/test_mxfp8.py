"""MXFP8 TN/NN GEMM tests (reference tests/mxfp8_test.py)."""
import ml_dtypes
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q


def _pseudoquant_mxfp8(x64: np.ndarray):
    """Golden MXFP8 pseudo-quantizer (mxfp8_test.py:26-46 semantics)."""
    orig = x64.shape
    x = x64.reshape(-1, 32)
    absmax = np.abs(x).max(axis=-1, keepdims=True)
    with np.errstate(divide="ignore"):
        e = np.where(absmax > 0,
                     np.floor(np.log2(np.where(absmax > 0, absmax, 1.0))) - 8 + 128,
                     128).astype(np.uint8)
    sc = np.ldexp(1.0, e.astype(np.int64) - 127)
    xq64 = np.clip(x / sc, -448.0, 448.0)
    xq = xq64.astype(ml_dtypes.bfloat16).astype(ml_dtypes.float8_e4m3fn)
    xdq = xq.astype(np.float64) * sc
    return (xdq.reshape(orig), xq.view(np.uint8).reshape(orig),
            e.reshape(orig[:-1] + (orig[-1] // 32,)))


SHAPES = [(16, 512, 4096), (16, 384, 10752), (7, 256, 5120)]


@pytest.mark.parametrize("shape", SHAPES)
def test_tn(shape):
    rng = np.random.default_rng(0)
    m, n, k = shape
    a64 = (rng.random((m, k)) * 25.0).astype(ml_dtypes.bfloat16).astype(np.float64)
    b64 = (rng.random((n, k)) * 25.0).astype(ml_dtypes.bfloat16).astype(np.float64)

    a_dq, a_e4m3, a_e8m0 = _pseudoquant_mxfp8(a64)
    b_dq, b_e4m3, b_e8m0 = _pseudoquant_mxfp8(b64)
    out_ref = (a_dq.astype(ml_dtypes.bfloat16).astype(np.float64)
               @ b_dq.astype(ml_dtypes.bfloat16).astype(np.float64).T)

    alpha = jnp.asarray([1.0], jnp.float32)
    out = q.matmul_mxf8_bf16_tn(jnp.asarray(a_e4m3), jnp.asarray(b_e4m3),
                                jnp.asarray(a_e8m0), jnp.asarray(b_e8m0), alpha)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               out_ref.astype(np.float32),
                               rtol=1e-1, atol=1e-1)


@pytest.mark.parametrize("shape", SHAPES)
def test_nn(shape):
    rng = np.random.default_rng(0)
    m, n, k = shape
    a64 = (rng.standard_normal((m, k)) * 25.0).astype(ml_dtypes.bfloat16).astype(np.float64)
    b64 = (rng.standard_normal((n, k)) * 25.0).astype(ml_dtypes.bfloat16).astype(np.float64)

    a_dq, a_e4m3, a_e8m0 = _pseudoquant_mxfp8(a64)
    b_dq, b_e4m3, b_e8m0 = _pseudoquant_mxfp8(b64)
    out_ref = (a_dq.astype(ml_dtypes.bfloat16).astype(np.float64)
               @ b_dq.astype(ml_dtypes.bfloat16).astype(np.float64).T)

    a_t = np.ascontiguousarray(a_e4m3.T)               # stored [K, M]
    alpha = jnp.asarray([1.0], jnp.float32)
    out = q.matmul_mxf8_bf16_nn(jnp.asarray(a_t), jnp.asarray(b_e4m3),
                                jnp.asarray(a_e8m0), jnp.asarray(b_e8m0), alpha)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               out_ref.astype(np.float32),
                               rtol=1e-1, atol=1e-1)


def test_tn_exactness_unit_scales():
    """With unit scales the fp8 GEMM must be bit-exact vs fp64 (quartet_test.py:263-281)."""
    rng = np.random.default_rng(0)
    m, n, k = 384, 256, 512
    a64 = rng.standard_normal((m, k))
    b64 = rng.standard_normal((n, k))
    a8 = a64.astype(ml_dtypes.bfloat16).astype(ml_dtypes.float8_e4m3fn)
    b8 = b64.astype(ml_dtypes.bfloat16).astype(ml_dtypes.float8_e4m3fn)
    ones = np.full((m, k // 32), 127, np.uint8)
    onesb = np.full((n, k // 32), 127, np.uint8)
    out = q.matmul_mxf8_bf16_tn(jnp.asarray(a8.view(np.uint8)),
                                jnp.asarray(b8.view(np.uint8)),
                                jnp.asarray(ones), jnp.asarray(onesb),
                                jnp.asarray([1.0], jnp.float32))
    ref = (a8.astype(np.float64) @ b8.astype(np.float64).T)
    # fp32 accumulation-order tie-rounding allows a tiny mismatch rate
    # (the reference prints this rate rather than asserting,
    # quartet_test.py:281)
    mismatch = (np.asarray(out).astype(ml_dtypes.bfloat16)
                != ref.astype(ml_dtypes.bfloat16)).mean()
    assert mismatch <= 1e-4
