"""NVFP4 fused-quantize + GEMM tests (reference tests/nvfp4_test.py)."""
import ml_dtypes
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu.formats import golden as G
from helpers import bf16_hadamard, randn_bf16, to_np64

ROT_SIZES = [16, 32, 64, 128]


@pytest.mark.parametrize("rot_size", ROT_SIZES)
@pytest.mark.parametrize("global_scale_value", [6.0])
def test_fused_quantization(rot_size, global_scale_value):
    rng = np.random.default_rng(0)
    x = randn_bf16(rng, 2, 512, 1024)
    gs = jnp.asarray([global_scale_value], jnp.float32)

    h = bf16_hadamard(rot_size)
    ref = G.quantize_nv(to_np64(x), to_np64(h), rot_size, global_scale_value,
                        "abs_max")
    e2m1, e4m3 = q.fusedQuantizeNv(x, h, gs)
    scales = np.asarray(e4m3)[:1024, :64].reshape(ref["e4m3"].shape)

    # e4m3 scales: fp32 vs fp64 amax can differ by one grid step
    sref = G.e4m3_to_f64(ref["e4m3"])
    sgot = G.e4m3_to_f64(scales)
    assert (sgot != sref).mean() <= 2e-2

    dq = (G.unpack_fp4(np.asarray(e2m1)).reshape(-1, 16)
          * G.e4m3_to_f64(scales).reshape(-1, 1)).reshape(ref["dq"].shape)
    mismatch = (dq != ref["dq"]).mean()
    assert mismatch <= 1e-1
    np.testing.assert_allclose(dq / global_scale_value,
                               ref["dq"] / global_scale_value,
                               rtol=0.34, atol=100)


@pytest.mark.parametrize("rot_size", ROT_SIZES)
@pytest.mark.parametrize("method", ["abs_max", "quest"])
def test_gemm_bit_exact(rot_size, method):
    rng = np.random.default_rng(0)
    m, n, k = 504, 512, 2048
    a = randn_bf16(rng, m, k)
    b = randn_bf16(rng, n, k)
    h = bf16_hadamard(rot_size)
    gs = jnp.asarray([1.0], jnp.float32)

    a_e2m1, a_e4m3 = q.fusedQuantizeNv(a, h, gs, method=method)
    b_e2m1, b_e4m3 = q.fusedQuantizeNv(b, h, gs, method=method)

    a_dq = (G.unpack_fp4(np.asarray(a_e2m1)).reshape(-1, 16)
            * G.e4m3_to_f64(np.asarray(a_e4m3)[:m, :k // 16]).reshape(-1, 1)
            ).reshape(m, k)
    b_dq = (G.unpack_fp4(np.asarray(b_e2m1)).reshape(-1, 16)
            * G.e4m3_to_f64(np.asarray(b_e4m3)[:n, :k // 16]).reshape(-1, 1)
            ).reshape(n, k)
    out_ref = a_dq @ b_dq.T

    alpha = jnp.asarray([1.0], jnp.float32)
    out = q.matmul_nvf4_bf16_tn(
        a_e2m1, b_e2m1,
        q.to_blocked(a_e4m3).reshape(-1, k // 16),
        q.to_blocked(b_e4m3).reshape(-1, k // 16), alpha)
    np.testing.assert_array_equal(np.asarray(out).astype(ml_dtypes.bfloat16),
                                  out_ref.astype(ml_dtypes.bfloat16))
