"""Accuracy of the int8-MXU evaluator for MXFP4 GEMMs (numpy, CPU).

Scheme: v = m * 2^(se_g - 1) with m in {0,+-1,..,+-12}; per row take
E = max_g se_g, shift a' = m << (3 - d) for deficit d = E - se_g <= 3
(exact) or a' = round(m / 2^(d-3)) for d > 3 (bounded rounding).  Then
  C = (a' @ b'^T) * 2^(Ea-4)[m] * 2^(Eb-4)[n]
Questions: deficit distribution on realistic data; relative error of
C_int8 vs the exact fp64 dequantized matmul; worst-case adversarial rows.
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from qutlass_tpu.formats import golden as G
from helpers import hadamard_matrix

rng = np.random.default_rng(0)


def encode_int8(packed, e8m0):
    """packed u8 [R, K/2], e8m0 [R, K/32] -> (a' int32 [R, K], scale [R])."""
    vals = G.unpack_fp4(packed)                    # fp64 grid values
    m = np.rint(vals * 2).astype(np.int64)         # +-{0..12}
    se = e8m0.astype(np.int64) - 127               # unbiased exponents
    E = se.max(axis=1)                             # [R]
    d = E[:, None] - se                            # deficits [R, K/32]
    dK = np.repeat(d, 32, axis=1)
    shifted = np.where(dK <= 3,
                       m * (1 << np.minimum(3 - dK, 3).clip(0)),
                       np.round(m / np.exp2(dK - 3)).astype(np.int64))
    assert np.abs(shifted).max() <= 127, np.abs(shifted).max()
    scale = np.exp2((E - 4).astype(np.float64) + 1)  # 2^(E-4) * 2 ... check
    return shifted, scale, dK


def check(name, a, b, h, rot=32, method="quest"):
    qa = G.quantize_mx(a, h, rot, method)
    qb = G.quantize_mx(b, h, rot, method)
    exact = qa["dq"] @ qb["dq"].T

    ai, sa, da = encode_int8(qa["e2m1"], qa["e8m0"])
    bi, sb, db = encode_int8(qb["e2m1"], qb["e8m0"])
    # v = m * 2^(se-1); a' = m * 2^(3-d) -> v = a' * 2^(se-1-(3-d))
    #   = a' * 2^(E-4).  So scale = 2^(Ea-4):
    sa = np.exp2(qa["e8m0"].astype(np.int64).max(axis=1) - 127 - 4.0)
    sb = np.exp2(qb["e8m0"].astype(np.int64).max(axis=1) - 127 - 4.0)
    approx = (ai @ bi.T) * sa[:, None] * sb[None, :]

    err = np.abs(approx - exact)
    denom = np.abs(exact).max()
    frob = np.linalg.norm(approx - exact) / (np.linalg.norm(exact) + 1e-30)
    bf16_ulp = 2.0 ** -8
    d_hist = np.bincount(np.clip(da.ravel(), 0, 12), minlength=13)
    print(f"{name:28s} deficit%>3: {100*(da>3).mean():6.3f}  "
          f"max|err|/max|C|: {err.max()/denom:9.2e}  frob: {frob:9.2e}  "
          f"vs bf16 ulp {bf16_ulp:.1e}")
    print(f"    deficit hist (0..12+): {d_hist.tolist()}")
    # how many bf16-rounded outputs differ?
    import ml_dtypes
    eb = exact.astype(ml_dtypes.bfloat16)
    ab = approx.astype(ml_dtypes.bfloat16)
    print(f"    bf16 output mismatch rate: {(eb != ab).mean():8.5f}")


def main():
    R, K = 256, 5120
    h = hadamard_matrix(32)

    a = rng.standard_normal((R, K))
    b = rng.standard_normal((R, K)) * 0.05
    check("gaussian act x weight", a, b, h)

    # heavy-tailed activations (pre-rotation outliers)
    a2 = a.copy()
    a2[rng.random(a2.shape) < 0.001] *= 100.0
    check("outlier act (1e-3 x100)", a2, b, h)

    # per-row scale spread (some rows tiny, some huge)
    a3 = a * np.exp2(rng.integers(-8, 8, (R, 1)).astype(np.float64))
    check("row-scaled act", a3, b, h)

    # adversarial: within-row group magnitudes spread over 2^12
    a4 = a * np.exp2(rng.integers(-12, 1, (R, K // 32)).astype(
        np.float64)).repeat(32, axis=1)
    check("adversarial group spread", a4, b, h)

    # abs_max method (scales differ from quest)
    check("gaussian abs_max", a, b, h, method="abs_max")

    # K sweep
    for k in (256, 25600):
        aa = rng.standard_normal((64, k))
        bb = rng.standard_normal((64, k)) * 0.05
        check(f"gaussian K={k}", aa, bb, h)


if __name__ == "__main__":
    main()
