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


def _quantize_nv_pair(rng, m, n, k):
    a, b = randn_bf16(rng, m, k), randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(16)
    gsa = jnp.asarray(1.3, jnp.float32)
    gsb = jnp.asarray(21.0, jnp.float32)
    aq, asf = E.fused_quantize_nv(a, h, gsa, rot_size=16, method="abs_max",
                                  layout="kmajor")
    bq, bsf = E.fused_quantize_nv(b, h, gsb, rot_size=16, method="abs_max",
                                  layout="kmajor")
    return (a, b, h, gsa, gsb), (aq, asf, bq, bsf)


def _plane_order(dq_nat):
    """natural [rows, K] fp64 -> plane-major [K, rows]."""
    t = dq_nat.T                                   # [K, rows]
    return np.concatenate([t[0::2], t[1::2]], axis=0)


def test_encode_nv_int8_bound():
    """Reconstruction a' * sigma is within sigma/2 of the exact
    dequantized NVFP4 value, elementwise (the documented bound)."""
    rng = np.random.default_rng(0)
    (a, _, h, gsa, _), (aq, asf, _, _) = _quantize_nv_pair(rng, 64, 32, 256)
    ai, sig = I8.encode_nv_int8_planes(aq, asf)
    ref = G.quantize_nv(to_np64(a), to_np64(h), 16, float(gsa), "abs_max")
    v_plane = _plane_order(ref["dq"])              # [K, M] fp64
    rec = np.asarray(ai, np.float64) * np.asarray(sig, np.float64)[None, :]
    err = np.abs(rec - v_plane)
    # sigma/2 plus f32-rounding slack (sigma and the division are f32)
    bound = np.asarray(sig, np.float64)[None, :] / 2 * (1 + 1e-5) + 1e-12
    assert (err <= bound).all(), float((err / bound).max())


def test_nv_int8_gemm_error_bound():
    """Int8-NV GEMM vs the fp64 dequant matmul: per-output error within
    the accumulation of the per-element bounds."""
    rng = np.random.default_rng(1)
    m, n, k = 64, 96, 512
    (a, b, h, gsa, gsb), (aq, asf, bq, bsf) = _quantize_nv_pair(
        rng, m, n, k)
    ai, sa = I8.encode_nv_int8_planes(aq, asf)
    bi, sb = I8.encode_nv_int8_planes(bq, bsf)
    alpha = (1.0 / (gsa * gsb)).reshape(1)
    y = np.asarray(I8.matmul_mxf4_bf16_int8_kk(ai, bi, sa, sb, alpha,
                                               out_dtype=jnp.float32),
                   np.float64)

    ra = G.quantize_nv(to_np64(a), to_np64(h), 16, float(gsa), "abs_max")
    rb = G.quantize_nv(to_np64(b), to_np64(h), 16, float(gsb), "abs_max")
    yref = (ra["dq"] @ rb["dq"].T) / (float(gsa) * float(gsb))

    # |err| <= alpha * sum_k (|va|*sb/2 + |vb|*sa/2 + sa*sb/4)
    sa64 = np.asarray(sa, np.float64)
    sb64 = np.asarray(sb, np.float64)
    va = np.abs(ra["dq"]).sum(axis=1)              # [M]
    vb = np.abs(rb["dq"]).sum(axis=1)              # [N]
    bound = (va[:, None] * sb64[None, :] / 2
             + vb[None, :] * sa64[:, None] / 2
             + k * sa64[:, None] * sb64[None, :] / 4
             ) / (float(gsa) * float(gsb)) * (1 + 1e-4) + 1e-9
    assert (np.abs(y - yref) <= bound).all(), \
        float((np.abs(y - yref) / bound).max())
    # and the error is far below the signal
    rel = np.abs(y - yref).max() / (np.abs(yref).max() + 1e-12)
    assert rel < 2e-2, rel
