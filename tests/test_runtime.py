"""Native host library tests: C golden vs numpy golden."""
import numpy as np
import pytest

from qutlass_tpu import runtime
from qutlass_tpu.formats import golden as G
from helpers import hadamard_matrix

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native host lib unavailable")


def test_scalar_codecs():
    import ml_dtypes
    # value-level equality (codes for +-0 differ legitimately between the
    # device encoder and the golden tie-break — both decode to +-0.0)
    grid = np.concatenate([G.E2M1_GRID_POS, -G.E2M1_GRID_POS])
    for x in [0.0, 0.3, 0.75, 1.25, 2.5, 5.0, -6.5, 7.0]:
        vals, _ = G.rtne_fp4(np.array([x, 0.0]))
        assert grid[runtime.e2m1_encode(x)] == vals[0]
    xs = np.linspace(-500, 500, 4001)
    ref = np.clip(xs, -448, 448).astype(ml_dtypes.float8_e4m3fn).view(np.uint8)
    got = np.array([runtime.e4m3_encode(v) for v in xs], np.uint8)
    np.testing.assert_array_equal(got, ref)


def test_quantize_golden_matches_numpy():
    rng = np.random.default_rng(0)
    import ml_dtypes
    x = (rng.standard_normal((64, 256)) * 25).astype(ml_dtypes.bfloat16)
    h = hadamard_matrix(32)
    for method in ("quest", "abs_max"):
        ref = G.quantize_mx(x.astype(np.float64), h, 32, method)
        packed, scales, mask = runtime.quantize_mx_golden(
            x.astype(np.float32), h.astype(np.float32), method,
            return_mask=True)
        np.testing.assert_array_equal(scales, ref["e8m0"])
        dq = runtime.dequantize_mx(packed, scales,
                                   1.0 if method == "quest" else 3.0)
        # float32 output: /3 for abs_max rounds in f32, so compare with
        # one-ulp tolerance; mismatch-rate budget as in the kernel tests
        close = np.isclose(dq.astype(np.float64), ref["dq"],
                           rtol=1e-6, atol=0)
        assert (~close).mean() <= 1e-4
        if method == "quest":
            np.testing.assert_array_equal(mask, ref["mask"])


def test_swizzle_matches_numpy():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 255, (256, 8), dtype=np.uint8)
    np.testing.assert_array_equal(runtime.to_blocked_swizzled(s),
                                  G.to_blocked_swizzled(s))
