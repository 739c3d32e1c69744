"""Fused single-kernel linear: must match the composed quantize+GEMM path."""
import ml_dtypes
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from helpers import bf16_hadamard, randn_bf16


@pytest.mark.parametrize("method", ["quest", "abs_max"])
@pytest.mark.parametrize("m", [1, 16, 200])
def test_fused_matches_composed(method, m):
    rng = np.random.default_rng(0)
    n, k = 512, 1024
    x = randn_bf16(rng, m, k, scale=2.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)

    wqt, wst = q.fusedQuantizeMx(w, h, method=method, layout="kmajor")
    y_fused = q.fused_linear_mxf4(x, wqt, wst, h, method=method)

    xq, xs = q.fusedQuantizeMx(x, h, method=method)
    wq, ws = q.fusedQuantizeMx(w, h, method=method)
    alpha = jnp.full((1,), 1.0 if method == "quest" else 1.0 / 9.0, jnp.float32)
    y_ref = q.matmul_mxf4_bf16_tn(xq, wq, xs[:m, :k // 32], ws[:n, :k // 32],
                                  alpha)
    a = np.asarray(y_fused, np.float32)
    b = np.asarray(y_ref, np.float32)
    # abs-max folds /9 differently (alpha vs per-operand /3): one-ulp slack
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-3)
    mismatch = (np.asarray(y_fused).astype(ml_dtypes.bfloat16)
                != np.asarray(y_ref).astype(ml_dtypes.bfloat16)).mean()
    assert mismatch <= (0.0 if method == "quest" else 2e-2), mismatch
