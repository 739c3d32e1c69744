"""Int8-MXU MXFP4 evaluator: exactness contract + deviation bound.

Contract (ops/int8path.py, docs/NUMERICS.md): when every row's
group-exponent spread is <= 3 (always true for the library's own
rotated quantized tensors), the int8 evaluation is bit-identical to the
decode GEMM; otherwise the per-element error is bounded by 2^(E-5).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu.formats import golden as G
from qutlass_tpu.ops import emulation as E
from qutlass_tpu.ops import int8path as I8
from helpers import bf16_hadamard, randn_bf16, to_np64

ONE = jnp.ones((1,), jnp.float32)


def _quantize_pair(rng, m, n, k, method="quest"):
    a, b = randn_bf16(rng, m, k), randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)
    aq, asf = E.fused_quantize_mx(a, h, rot_size=32, method=method,
                                  layout="kmajor")
    bq, bsf = E.fused_quantize_mx(b, h, rot_size=32, method=method,
                                  layout="kmajor")
    return aq, asf, bq, bsf


@pytest.mark.parametrize("shape", [(64, 96, 256), (33, 48, 512),
                                   (128, 256, 1024)])
@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_int8_bit_exact_on_pipeline_data(shape, method):
    """Quantizer-produced tensors satisfy the deficit budget -> the
    int8 evaluator must equal the decode GEMM bitwise."""
    m, n, k = shape
    rng = np.random.default_rng(hash((m, n, k, method)) % 2**31)
    aq, asf, bq, bsf = _quantize_pair(rng, m, n, k, method)

    ai, sa, da = I8.encode_int8(aq, asf, kmajor=True)
    bi, sb, db = I8.encode_int8(bq, bsf, kmajor=True)
    assert int(da) <= 3 and int(db) <= 3, (int(da), int(db))

    ref = E.matmul_mxf4_bf16_kmajor(aq, bq, asf, bsf, ONE)
    out = I8.matmul_mxf4_bf16_int8_kmajor(ai, bi.T, sa, sb, ONE)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_int8_rowmajor_matches_kmajor():
    rng = np.random.default_rng(7)
    aq, asf, bq, bsf = _quantize_pair(rng, 64, 96, 256)
    ai_k, sa_k, _ = I8.encode_int8(aq, asf, kmajor=True)
    ai_r, sa_r, _ = I8.encode_int8(np.asarray(aq).T, np.asarray(asf).T)
    np.testing.assert_array_equal(np.asarray(ai_k).T, np.asarray(ai_r))
    np.testing.assert_array_equal(np.asarray(sa_k), np.asarray(sa_r))
    out1 = I8.matmul_mxf4_bf16_int8_kmajor(
        ai_k, I8.encode_int8(bq, bsf, kmajor=True)[0].T,
        sa_k, I8.encode_int8(bq, bsf, kmajor=True)[1], ONE)
    bi, sb, _ = I8.encode_int8(bq, bsf, kmajor=True)
    out2 = I8.matmul_mxf4_bf16_int8(ai_r, bi.T, sa_r, sb, ONE)
    np.testing.assert_array_equal(np.asarray(out1, np.float32),
                                  np.asarray(out2, np.float32))


def test_int8_alpha():
    rng = np.random.default_rng(11)
    aq, asf, bq, bsf = _quantize_pair(rng, 32, 32, 256)
    ai, sa, _ = I8.encode_int8(aq, asf, kmajor=True)
    bi, sb, _ = I8.encode_int8(bq, bsf, kmajor=True)
    alpha = jnp.full((1,), 1.0 / 9.0, jnp.float32)
    ref = E.matmul_mxf4_bf16_kmajor(aq, bq, asf, bsf, alpha)
    out = I8.matmul_mxf4_bf16_int8_kmajor(ai, bi.T, sa, sb, alpha)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_prepare_weight_int8_exact():
    rng = np.random.default_rng(13)
    aq, asf, bq, bsf = _quantize_pair(rng, 48, 64, 512)
    w_i8, sbv, dmax = I8.prepare_weight_int8(bq, bsf)
    assert int(dmax) <= 3
    ai, sa, _ = I8.encode_int8(aq, asf, kmajor=True)
    ref = E.matmul_mxf4_bf16_kmajor(aq, bq, asf, bsf, ONE)
    out = I8.matmul_mxf4_bf16_int8_kmajor(ai, w_i8, sa, sbv, ONE)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_deficit_overflow_bounded_deviation():
    """Adversarial group spread (> 3 binades) must degrade gracefully:
    |err| <= 2^(Ea-5) * sum|b| per output, and max_deficit reports it."""
    rng = np.random.default_rng(17)
    m, n, k = 32, 32, 256
    # hand-build codes/scales with a 6-binade group spread
    codes = rng.integers(0, 16, (m, k)).astype(np.uint8)
    se = rng.integers(-6, 1, (m, k // 32)).astype(np.int32)
    se[:, 0] = 0                                  # force E = 0 per row
    sbytes = (se + 127).astype(np.uint8)
    bq = rng.integers(0, 16, (n, k)).astype(np.uint8)
    bse = np.zeros((n, k // 32), np.int32)
    bsbytes = (bse + 127).astype(np.uint8)

    ai, sa, da = I8.encode_int8(jnp.asarray(codes), jnp.asarray(sbytes))
    bi, sb, db = I8.encode_int8(jnp.asarray(bq), jnp.asarray(bsbytes))
    assert int(da) > 3 and int(db) == 0

    # fp64 exact evaluation
    def dq(c, s):
        v = np.asarray(I8._codes_to_m2(jnp.asarray(c))) / 2.0
        return v * np.exp2(np.repeat(s, 32, axis=-1))
    exact = dq(codes, se) @ dq(bq, bse).T
    out = I8.matmul_mxf4_bf16_int8(ai, bi, sa, sb, ONE)
    err = np.abs(np.asarray(out, np.float64) - exact)
    # bound: per-element encode error <= 2^(E-5) = 2^-5; |b| <= 6
    bound = k * 2.0 ** -5 * 6.0 + np.abs(exact) * 2.0 ** -8  # + bf16 round
    assert (err <= bound + 1e-6).all(), err.max()


def test_plane_major_encode_bit_identical_dot():
    """encode_int8_planes: permuted-K operands give the SAME integer
    dot as natural-order encoding (order-invariant contraction)."""
    rng = np.random.default_rng(23)
    aq, asf, bq, bsf = _quantize_pair(rng, 64, 96, 512)
    ai_n, sa_n, _ = I8.encode_int8(aq, asf, kmajor=True)
    bi_n, sb_n, _ = I8.encode_int8(bq, bsf, kmajor=True)
    ref = I8.matmul_mxf4_bf16_int8_kk(ai_n, bi_n, sa_n, sb_n, ONE)
    ai_p, sa_p, _ = I8.encode_int8_planes(aq, asf)
    bi_p, sb_p, _ = I8.encode_int8_planes(bq, bsf)
    np.testing.assert_array_equal(np.asarray(sa_p), np.asarray(sa_n))
    out = I8.matmul_mxf4_bf16_int8_kk(ai_p, bi_p, sa_p, sb_p, ONE)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
