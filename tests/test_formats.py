"""Codec unit tests: jnp device-semantics codecs vs fp64 golden / ml_dtypes."""
import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qutlass_tpu.formats import codecs as C
from qutlass_tpu.formats import golden as G


def test_e2m1_rtne_matches_golden_dense():
    # Dense sweep including every tie midpoint and boundary.
    xs = np.concatenate([
        np.linspace(-8, 8, 100002),
        np.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0, 6.0, 6.5, 7.0]),
        -np.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0, 6.0, 6.5, 7.0]),
        np.array([0.0, -0.0]),
    ])
    codes = np.asarray(C.e2m1_rtne_codes(jnp.asarray(xs, jnp.float32)))
    vals = np.asarray(C.e2m1_decode_f32(jnp.asarray(codes)))
    ref_vals, _ = G.rtne_fp4(xs)
    np.testing.assert_array_equal(vals, ref_vals)


def test_e2m1_encoders_agree():
    # The integer-domain production encoder vs the float-domain spec
    # (proven equal exhaustively over [-8, 8]; this guards regressions).
    rng = np.random.default_rng(1)
    xs = np.concatenate([
        rng.standard_normal(1 << 16).astype(np.float32) * 3,
        np.linspace(-8, 8, 100002, dtype=np.float32),
        np.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0, 6.0, -0.25,
                  -0.75, -5.0, 0.0, -0.0, np.inf, -np.inf, np.nan,
                  1e30, -1e30], np.float32),
    ])
    a = np.asarray(C.e2m1_rtne_codes_float(jnp.asarray(xs)))
    b = np.asarray(C.e2m1_rtne_codes_bits(jnp.asarray(xs)))
    np.testing.assert_array_equal(a, b)


def test_e2m1_direct_m2_matches_code_path():
    # The direct grid-rounding m2 (used by the fused quantize+int8
    # kernels) vs the encode->decode composition, over a dense sweep,
    # every tie midpoint, specials, and bit-pattern extremes.
    rng = np.random.default_rng(2)
    xs = np.concatenate([
        rng.standard_normal(1 << 16).astype(np.float32) * 3,
        np.linspace(-8, 8, 200003, dtype=np.float32),
        np.array([0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0, 6.0, -0.25,
                  -0.75, -2.5, -3.5, -5.0, 0.0, -0.0, np.inf, -np.inf,
                  np.nan, -np.nan, 1e30, -1e30, 1e-30, -1e-30,
                  2.0, 4.0, -2.0, -4.0, np.nextafter(2.0, 3.0),
                  np.nextafter(4.0, 5.0), np.nextafter(2.0, 0.0),
                  np.nextafter(4.0, 0.0)], np.float32),
    ])
    want = np.asarray(C.e2m1_codes_to_m2(
        C.e2m1_rtne_codes(jnp.asarray(xs)))).astype(np.float32)
    got = np.asarray(C.e2m1_rtne_m2_f32(jnp.asarray(xs)))
    np.testing.assert_array_equal(got, want)


def test_e2m1_decode_all_codes():
    codes = jnp.arange(16, dtype=jnp.int32)
    vals = np.asarray(C.e2m1_decode_f32(codes))
    expect = np.concatenate([G.E2M1_GRID_POS, -G.E2M1_GRID_POS])
    np.testing.assert_array_equal(vals, expect)


def test_e2m1_decode_scaled_exact():
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 16, size=4096), jnp.int32)
    sbytes = jnp.asarray(rng.integers(40, 220, size=4096), jnp.int32)
    got = np.asarray(C.e2m1_decode_scaled_bf16(codes, sbytes), dtype=np.float64)
    expect = (np.asarray(C.e2m1_decode_f32(codes)).astype(np.float64)
              * G.e8m0_to_f64(np.asarray(sbytes)))
    np.testing.assert_array_equal(got, expect)


def test_pow2_floor_e8m0():
    xs = np.array([1e-8, 0.1, 0.5, 1.0, 1.5, 2.0, 3.9, 4.0, 100.0, 3e38],
                  dtype=np.float32)
    f, b = C.pow2_floor_e8m0(jnp.asarray(xs))
    expect = np.exp2(np.floor(np.log2(xs.astype(np.float64))))
    np.testing.assert_array_equal(np.asarray(f, np.float64), expect)
    np.testing.assert_array_equal(G.e8m0_to_f64(np.asarray(b)), expect)


def test_e8m0_decode():
    b = jnp.arange(255, dtype=jnp.int32)
    got = np.asarray(C.e8m0_decode_f32(b), dtype=np.float64)
    np.testing.assert_array_equal(got, G.e8m0_to_f64(np.arange(255)))


def test_e4m3_roundtrip_all_bytes():
    b = np.arange(256, dtype=np.uint8)
    ref = b.view(ml_dtypes.float8_e4m3fn).astype(np.float64)
    got = np.asarray(C.e4m3_decode_f32(jnp.asarray(b, jnp.int32)), np.float64)
    np.testing.assert_array_equal(got[~np.isnan(ref)], ref[~np.isnan(ref)])
    assert np.all(np.isnan(got[np.isnan(ref)]))
    # re-encode every finite value reproduces the byte (modulo -0 vs 0)
    finite = ~np.isnan(ref)
    enc = np.asarray(C.e4m3_rtne_bytes(jnp.asarray(ref[finite], jnp.float32)))
    np.testing.assert_array_equal(enc.astype(np.uint8), b[finite])


def test_e4m3_encode_matches_mldtypes_random():
    rng = np.random.default_rng(1)
    xs = np.concatenate([
        rng.standard_normal(20000) * np.exp2(rng.integers(-12, 12, 20000)),
        np.array([447.0, 448.0, 449.0, 460.0, 464.0, 1000.0, -1000.0,
                  2.0**-9, 2.0**-10, 1.5 * 2.0**-9, 0.0, -0.0]),
    ]).astype(np.float32)
    ref = np.clip(xs, -448, 448).astype(ml_dtypes.float8_e4m3fn).view(np.uint8)
    got = np.asarray(C.e4m3_rtne_bytes(jnp.asarray(xs))).astype(np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_e4m3_decode_scaled():
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.integers(0, 127, size=2048), jnp.int32)  # positive finite
    s = jnp.asarray(rng.integers(100, 150, size=2048), jnp.int32)
    got = np.asarray(C.e4m3_decode_scaled_bf16(b, s), dtype=np.float64)
    expect = (G.e4m3_to_f64(np.asarray(b)) * G.e8m0_to_f64(np.asarray(s)))
    expect_bf16 = expect.astype(ml_dtypes.bfloat16).astype(np.float64)
    np.testing.assert_array_equal(got, expect_bf16)


def test_mxfp8_shared_exp():
    amax = jnp.asarray([0.0, 1.0, 1.5, 2.0, 0.25, 1000.0], jnp.float32)
    got = np.asarray(C.mxfp8_shared_exp_bytes(amax))
    expect = np.array([127, 127 - 7, 127 - 7, 128 - 7, 125 - 7, 136 - 7])
    np.testing.assert_array_equal(got, expect)


def test_golden_selfcheck_rtne_pack_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 64)) * 3
    vals, packed = G.rtne_fp4(x)
    np.testing.assert_array_equal(G.unpack_fp4(packed), vals)


def test_scaled_decode_subnormal_edges():
    """Scaled decoders at extreme scale bytes: exponent-field underflow
    produces the exact bf16 subnormal (fp64-checked), e4m3 overflow
    saturates to inf — reachable only via imported scale bytes."""
    import ml_dtypes
    from qutlass_tpu.formats import codecs as C

    codes = jnp.asarray([[c for c in range(16)]], jnp.int32)
    for sb in (0, 1, 2, 5, 250, 254):
        got = np.asarray(C.e2m1_decode_scaled_bf16(
            codes, jnp.full((1, 1), sb, jnp.int32))).astype(np.float64)
        grid = np.asarray([0, .5, 1, 1.5, 2, 3, 4, 6], np.float64)
        vals = np.concatenate([grid, -grid]) * 2.0 ** (sb - 127)
        want = vals.astype(ml_dtypes.bfloat16).astype(np.float64)
        np.testing.assert_array_equal(got[0], want, err_msg=f"sb={sb}")

    # e4m3 scaled decode: subnormal-range scale and inf saturation
    from qutlass_tpu.formats.golden import e4m3_to_f64
    bytes_ = jnp.asarray([[b for b in range(1, 127)]], jnp.int32)
    for sb in (0, 4, 250, 254):
        got = np.asarray(C.e4m3_decode_scaled_bf16(
            bytes_, jnp.full((1, 1), sb, jnp.int32))).astype(np.float64)
        want64 = e4m3_to_f64(np.arange(1, 127)) * 2.0 ** (sb - 127)
        want = want64.astype(ml_dtypes.bfloat16).astype(np.float64)
        np.testing.assert_array_equal(got[0], want, err_msg=f"sb={sb}")


def test_mxfp8_shared_exp_wraps_like_golden():
    """Tiny-amax tiles wrap the shared-exponent byte mod 256 exactly
    like the fp64 golden's uint8 store (regression: negative byte)."""
    from qutlass_tpu.formats import codecs as C

    amax = jnp.asarray([2.0 ** -126, 2.0 ** -120, 0.0, 1.0, 2.0 ** 100],
                       jnp.float32)
    got = np.asarray(C.mxfp8_shared_exp_bytes(amax))
    want = np.where(
        np.asarray(amax) > 0,
        (np.floor(np.log2(np.asarray(amax, np.float64),
                          where=np.asarray(amax) > 0,
                          out=np.ones(5))) - 7 + 127).astype(np.int64),
        127).astype(np.uint8)
    np.testing.assert_array_equal(got.astype(np.uint8), want)


def test_scaled_decode_nan_inputs():
    """Imported NaN bytes decode to NaN like the fp64 oracle: e8m0
    scale byte 255 (MX NaN) poisons the whole group in both decoders;
    e4m3fn data S.1111.111 is NaN at any scale."""
    from qutlass_tpu.formats import codecs as C

    codes = jnp.asarray([[c for c in range(16)]], jnp.int32)
    got = np.asarray(C.e2m1_decode_scaled_bf16(
        codes, jnp.full((1, 1), 255, jnp.int32))).astype(np.float64)
    assert np.isnan(got).all()

    b = jnp.asarray([[0x7F, 0xFF, 0x40]], jnp.int32)
    got = np.asarray(C.e4m3_decode_scaled_bf16(
        b, jnp.full((1, 1), 127, jnp.int32))).astype(np.float64)
    assert np.isnan(got[0, 0]) and np.isnan(got[0, 1])
    assert got[0, 2] == 2.0 ** 1     # 0x40 = 2.0 normal at unit scale
    got = np.asarray(C.e4m3_decode_scaled_bf16(
        b, jnp.full((1, 1), 255, jnp.int32))).astype(np.float64)
    assert np.isnan(got).all()
