"""MXFP4 fused-quantize + GEMM tests vs the fp64 golden models.

Mirrors reference tests/mxfp4_test.py: scales must match the golden
exactly, dequantized values up to a 1e-4 tie-break mismatch rate, and the
GEMM must be bit-exact against the fp64 dequantized matmul.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu.formats import golden as G
from helpers import bf16_hadamard, randn_bf16, rand_bf16, to_np64

ROT_SIZES = [32, 64, 128]


def _run_quantize_check(x, h, rot_size, method):
    ref = G.quantize_mx(to_np64(x), to_np64(h), rot_size, method)
    out = q.fusedQuantizeMx(x, h, method=method)
    e2m1, e8m0 = out[0], out[1]
    rows = x.size // x.shape[-1]
    cols = x.shape[-1] // 32
    scales = np.asarray(e8m0)[:rows, :cols].reshape(ref["e8m0"].shape)
    np.testing.assert_array_equal(scales, ref["e8m0"])

    alpha = 1.0 if method == "quest" else 3.0
    dq = G.dq_fp4(np.asarray(e2m1), scales, 32, alpha)
    mismatch = (dq != ref["dq"]).mean()
    assert mismatch <= 1e-4, f"value mismatch rate {mismatch}"
    np.testing.assert_allclose(dq, ref["dq"], rtol=0.34, atol=100)
    return e2m1, e8m0


@pytest.mark.parametrize("rot_size", ROT_SIZES)
@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_fused_quantization(rot_size, method):
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 2, 512, 1024)
    h = bf16_hadamard(rot_size)
    _run_quantize_check(x, h, rot_size, method)


def test_fused_quantization_mask():
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 512, 1024)
    h = bf16_hadamard(32)
    ref = G.quantize_mx(to_np64(x), to_np64(h), 32, "quest")
    e2m1, e8m0, mask = q.fusedQuantizeMx(x, h, method="quest", return_mask=True)
    np.testing.assert_array_equal(np.asarray(e8m0)[:512, :32], ref["e8m0"])
    # mask bits agree except where |q| sits within fp32 noise of 6.0
    got_bits = G.unpack_mask(np.asarray(mask))
    assert (got_bits != ref["mask_bits"]).mean() <= 1e-5


@pytest.mark.parametrize("rot_size", ROT_SIZES)
@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_gemm_bit_exact(rot_size, method):
    rng = np.random.default_rng(0)
    m, n, k = 504, 504, 2048
    a = randn_bf16(rng, m, k)
    b = randn_bf16(rng, n, k)
    h = bf16_hadamard(rot_size)

    a_e2m1, a_e8m0 = q.fusedQuantizeMx(a, h, method=method)
    b_e2m1, b_e8m0 = q.fusedQuantizeMx(b, h, method=method)

    a_dq = G.dq_fp4(np.asarray(a_e2m1), np.asarray(a_e8m0)[:m, :k // 32], 32, 1.0)
    b_dq = G.dq_fp4(np.asarray(b_e2m1), np.asarray(b_e8m0)[:n, :k // 32], 32, 1.0)
    out_ref = (a_dq @ b_dq.T).astype(np.float64)

    alpha = jnp.asarray([1.0], jnp.float32)
    out = q.matmul_mxf4_bf16_tn(a_e2m1, b_e2m1,
                                q.to_blocked(a_e8m0), q.to_blocked(b_e8m0), alpha)
    import ml_dtypes
    ref_bf16 = out_ref.astype(ml_dtypes.bfloat16)
    got = np.asarray(out).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got, ref_bf16)


# Model-layer geometries (scaled-down Llama columns; K from real models).
MODEL_SHAPES = {
    "7B-qkv": (4096, 512),
    "7B-down": (10752, 256),
    "13B-up": (5120, 384),
}


@pytest.mark.parametrize("geom", list(MODEL_SHAPES.keys()))
@pytest.mark.parametrize("batch", [1, 16])
@pytest.mark.parametrize("had_size", [32, 128])
def test_model_shapes(geom, batch, had_size):
    rng = np.random.default_rng(0)
    k, n = MODEL_SHAPES[geom]
    m = batch
    h = bf16_hadamard(had_size)
    a = rand_bf16(rng, m, k)
    b = rand_bf16(rng, n, k)

    a_e2m1, a_e8m0 = q.fusedQuantizeMx(a, h, method="quest")
    b_e2m1, b_e8m0 = q.fusedQuantizeMx(b, h, method="quest")

    a_dq = G.dq_fp4(np.asarray(a_e2m1), np.asarray(a_e8m0)[:m, :k // 32], 32, 1.0)
    b_dq = G.dq_fp4(np.asarray(b_e2m1), np.asarray(b_e8m0)[:n, :k // 32], 32, 1.0)
    out_ref = a_dq @ b_dq.T

    alpha = jnp.asarray([1.0], jnp.float32)
    out = q.matmul_mxf4_bf16_tn(a_e2m1, b_e2m1,
                                q.to_blocked(a_e8m0), q.to_blocked(b_e8m0), alpha)
    import ml_dtypes
    np.testing.assert_array_equal(np.asarray(out).astype(ml_dtypes.bfloat16),
                                  out_ref.astype(ml_dtypes.bfloat16))


def test_alpha_scaling():
    rng = np.random.default_rng(0)
    m, n, k = 64, 64, 256
    a = randn_bf16(rng, m, k)
    b = randn_bf16(rng, n, k)
    h = bf16_hadamard(32)
    a_e2m1, a_e8m0 = q.fusedQuantizeMx(a, h, method="quest")
    b_e2m1, b_e8m0 = q.fusedQuantizeMx(b, h, method="quest")
    out1 = q.matmul_mxf4_bf16_tn(a_e2m1, b_e2m1, a_e8m0, b_e8m0,
                                 jnp.asarray([1.0], jnp.float32))
    out2 = q.matmul_mxf4_bf16_tn(a_e2m1, b_e2m1, a_e8m0, b_e8m0,
                                 jnp.asarray([0.5], jnp.float32))
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(out1, np.float32) * 0.5,
                               rtol=1e-2, atol=1e-2)
