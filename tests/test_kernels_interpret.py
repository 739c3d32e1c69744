"""Pallas kernel logic tests in interpret mode (CPU).

Runs the actual kernel bodies through the Pallas interpreter and checks
them bitwise against the XLA emulation backend — kernel-logic coverage
without TPU hardware (Mosaic lowering is validated separately on-device).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from qutlass_tpu.kernels import backward as KB
from qutlass_tpu.kernels import fused_linear as KF
from qutlass_tpu.kernels import gemm as KG
from qutlass_tpu.kernels import quantize as KQ
from qutlass_tpu.ops import emulation as E
from helpers import bf16_hadamard, randn_bf16

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("cpu",),
    reason="interpret-mode comparison runs on CPU")


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return (randn_bf16(rng, 256, 512), bf16_hadamard(32),
            jnp.ones((1,), jnp.float32))


@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_quantize_mx(data, method):
    x, h, _ = data
    pq, ps = KQ.fused_quantize_mx(x, h, rot_size=32, method=method)
    eq, es = E.fused_quantize_mx(x, h, rot_size=32, method=method)
    np.testing.assert_array_equal(np.asarray(pq), np.asarray(eq))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(es))


def test_quantize_mx_mask_and_kmajor(data):
    x, h, _ = data
    pq, ps, pm = KQ.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                      return_mask=True)
    eq, es, em = E.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                     return_mask=True)
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(em))
    kq, ks = KQ.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                  layout="kmajor")
    np.testing.assert_array_equal(np.asarray(kq), np.asarray(eq).T)


def test_quantize_nv(data):
    x, h, one = data
    pq, ps = KQ.fused_quantize_nv(x, h, one * 6.0, rot_size=32,
                                  method="abs_max")
    eq, es = E.fused_quantize_nv(x, h, one * 6.0, rot_size=32,
                                 method="abs_max")
    np.testing.assert_array_equal(np.asarray(pq), np.asarray(eq))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(es))


def test_quantize_nv_kmajor_and_fused_linear(data):
    x, h, one = data
    gs = one * 6.0
    kq, ks = KQ.fused_quantize_nv(x, h, gs, rot_size=32, method="abs_max",
                                  layout="kmajor")
    eq, es = E.fused_quantize_nv(x, h, gs, rot_size=32, method="abs_max",
                                 layout="kmajor")
    np.testing.assert_array_equal(np.asarray(kq), np.asarray(eq))
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(es))
    out_p = KG.matmul_nvf4_bf16_kmajor(kq, kq, ks, ks, one)
    out_e = E.matmul_nvf4_bf16_kmajor(eq, eq, es, es, one)
    np.testing.assert_array_equal(np.asarray(out_p, np.float32),
                                  np.asarray(out_e, np.float32))
    fl_p = KF.fused_linear_nvf4(x, kq, ks, h, gs, one, rot_size=32)
    fl_e = E.fused_linear_nvf4(x, eq, es, h, gs, one, rot_size=32)
    np.testing.assert_array_equal(np.asarray(fl_p, np.float32),
                                  np.asarray(fl_e, np.float32))


def test_gemm_mxf4(data):
    x, h, one = data
    xq, xs = E.fused_quantize_mx(x, h, rot_size=32, method="quest")
    xs = xs[:256, :16]
    out_p = KG.matmul_mxf4_bf16_tn(xq, xq, xs, xs, one)
    out_e = E.matmul_mxf4_bf16_tn(xq, xq, xs, xs, one)
    np.testing.assert_array_equal(np.asarray(out_p, np.float32),
                                  np.asarray(out_e, np.float32))


def test_gemm_mxf4_codes_layout(data):
    x, h, one = data
    cq, cs = KQ.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                  layout="kmajor_codes")
    eq, es = E.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                 layout="kmajor_codes")
    np.testing.assert_array_equal(np.asarray(cq), np.asarray(eq))
    np.testing.assert_array_equal(np.asarray(cs), np.asarray(es))
    wq, ws = KQ.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                  layout="kmajor")
    out_c = KG.matmul_mxf4_bf16_kmajor_codes(cq, wq, cs, ws, one)
    out_p = KG.matmul_mxf4_bf16_kmajor(wq, wq, ws, ws, one)  # same x==w data
    np.testing.assert_array_equal(np.asarray(out_c, np.float32),
                                  np.asarray(out_p, np.float32))
    out_e = E.matmul_mxf4_bf16_kmajor_codes(eq, wq, es, ws, one)
    np.testing.assert_array_equal(np.asarray(out_c, np.float32),
                                  np.asarray(out_e, np.float32))


def test_fused_linear(data):
    x, h, one = data
    wqt, wst = E.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                   layout="kmajor")
    out_p = KF.fused_linear_mxf4(x, wqt, wst, h, one, rot_size=32)
    out_e = E.fused_linear_mxf4(x, wqt, wst, h, one, rot_size=32)
    np.testing.assert_array_equal(np.asarray(out_p, np.float32),
                                  np.asarray(out_e, np.float32))


def test_backward_t(data):
    x, h, _ = data
    pk, st = KB.backward_t_bf16_2d(x, h, rot_size=32)
    ek, es = E.backward_t_bf16(x, h, rot_size=32)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(st), np.asarray(es))


def test_backward_qt(data):
    x, h, _ = data
    xq, xs = E.fused_quantize_mx(x, h, rot_size=32, method="abs_max")
    xs = xs[:256, :16]
    al = jnp.asarray([3.0], jnp.float32)
    pk, ps = KB.backward_qt_bf16_2d(xq, xs, h, al, rot_size=32)
    ek, es = E.backward_qt_bf16(xq, xs, h, al, rot_size=32)
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(es))
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(ek))


def test_square_double(data):
    x, _, _ = data
    fp, rp, cp = KB.backward_bf16_square_double_mxfp8_2d(x)
    fe, re, ce = E.backward_bf16_square_double_mxfp8(x)
    np.testing.assert_array_equal(np.asarray(rp), np.asarray(re))
    np.testing.assert_array_equal(np.asarray(cp), np.asarray(ce))
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fe))


def test_fp4_transpose_fp8(data):
    x, h, _ = data
    xq, xs = E.fused_quantize_mx(x, h, rot_size=32, method="abs_max")
    xs = xs[:256, :16]
    fp, sp = KB.mxfp4_transpose_mxfp8_2d(xq, xs)
    fe, se = E.mxfp4_transpose_mxfp8(xq, xs)
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(se))
    np.testing.assert_array_equal(np.asarray(fp), np.asarray(fe))


def test_gemm_kmajor_tiny_m(data):
    """Degenerate lane dims (m < 8) pad to 8 inside _run_gemm; output is
    bit-identical to the emulation GEMM (Mosaic hangs on 1-lane blocks,
    so the pad is load-bearing on real TPUs)."""
    _, h, one = data
    rng = np.random.default_rng(7)
    w = randn_bf16(rng, 64, 512)
    wqt, wst = E.fused_quantize_mx(w, h, rot_size=32, method="quest",
                                   layout="kmajor")
    for m in (1, 3):
        x = randn_bf16(rng, m, 512)
        xqt, xst = E.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                       layout="kmajor")
        got = KG.matmul_mxf4_bf16_kmajor(xqt, wqt, xst, wst, one)
        want = E.matmul_mxf4_bf16_kmajor(xqt, wqt, xst, wst, one)
        assert got.shape == (m, 64)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_backward_qt_batched(data):
    # batched [B, M, N/2] routes through vmap of the 2-D kernel and must
    # match the emulation batch semantics bitwise
    from qutlass_tpu.ops import pallas_ops as PO
    x, h, _ = data
    xb = jnp.stack([x, -x])                       # [2, 256, 512]
    xq, xs = E.fused_quantize_mx(xb, h, rot_size=32, method="abs_max")
    xs3 = xs.reshape(2, 256, -1)[:, :, :16]
    al = jnp.asarray([3.0], jnp.float32)
    pk, ps = PO.backward_qt_bf16(xq, xs3, h, al, rot_size=32)
    ek, es = E.backward_qt_bf16(xq, xs3, h, al, rot_size=32)
    assert pk.shape == ek.shape and ps.shape == es.shape
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(es))
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(ek))


@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_quantize_mx_int8_fused(data, method):
    """Fused quantize+int8-encode kernel (single-shot whole-K path) ==
    emulation twin, bitwise (operand, row scale, scale bytes)."""
    x, h, _ = data
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method=method)
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method=method)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psa), np.asarray(esa))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))


@pytest.mark.parametrize("ratio_log2", [4, 5, 6, 17])
def test_quantize_mx_int8_fused_wide_spread(ratio_log2):
    """Fused int8 quantize stays bitwise vs emulation on rows whose
    group-exponent SPREAD exceeds 3 — the regime where the encode's
    pow2 rescale m2 * 2^(3-d) must RTNE-round instead of shifting
    exactly.  Activations carry no spread guarantee (weights fall back
    to fp4 at deficit > 3); a shift-based emit that assumed d <= 3
    broke exactly here (round-3 regression, caught on-device as a
    1-in-64 decode-row divergence)."""
    rng = np.random.default_rng(ratio_log2)
    rows, k = 64, 512
    xa = rng.standard_normal((rows, k))
    xa[0] = np.concatenate([rng.standard_normal(32)
                            * (1.0 if g % 2 == 0 else 2.0 ** -ratio_log2)
                            for g in range(k // 32)])
    x = jnp.asarray(xa, jnp.bfloat16)
    h = bf16_hadamard(32)
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method="quest")
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method="quest")
    spread = (np.asarray(psb)[:, 0].astype(np.int32).max()
              - np.asarray(psb)[:, 0].astype(np.int32).min())
    assert spread > 3, "probe row must exercise the deep-deficit regime"
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psa), np.asarray(esa))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))


@pytest.mark.parametrize("method", ["abs_max", "quest"])
def test_quantize_nv_int8_fused(data, method):
    x, h, one = data
    h16 = bf16_hadamard(16)
    gs = jnp.asarray(1.7, jnp.float32)
    pa, psg, psb = KQ.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                             method=method)
    ea, esg, esb = E.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                            method=method)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psg), np.asarray(esg))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))


@pytest.mark.parametrize("method", ["quest", "abs_max"])
def test_quantize_int8_fused_revisit_path(data, method, monkeypatch):
    """Large K routes to the revisited-block kernel (oneshot over
    VMEM); force that path on a small shape — still bitwise equal."""
    x, h, _ = data
    monkeypatch.setattr(KQ, "quantize_int8_oneshot_bm", lambda *a, **k: 0)
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method=method)
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method=method)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psa), np.asarray(esa))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))
    h16 = bf16_hadamard(16)
    gs = jnp.asarray(1.7, jnp.float32)
    na, nsg, nsb = KQ.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                             method=method)
    ma, msg, msb = E.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                            method=method)
    np.testing.assert_array_equal(np.asarray(na), np.asarray(ma))
    np.testing.assert_array_equal(np.asarray(nsg), np.asarray(msg))
    np.testing.assert_array_equal(np.asarray(nsb), np.asarray(msb))


def test_quantize_int8_fused_huge_k_fallback(monkeypatch):
    """When no lane-legal bm fits the VMEM budget (huge K), the fused
    wrappers compose the two-pass path — still bitwise equal."""
    rng = np.random.default_rng(5)
    x, h = randn_bf16(rng, 192, 1536), bf16_hadamard(32)
    monkeypatch.setattr(KQ, "quantize_int8_oneshot_bm", lambda *a, **k: 0)
    monkeypatch.setattr(KQ, "quantize_int8_tiles", lambda *a, **k: (64, 512))
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method="quest")
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method="quest")
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psa), np.asarray(esa))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))
    gs = jnp.asarray(1.3, jnp.float32)
    h16 = bf16_hadamard(16)
    na, nsg, nsb = KQ.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                             method="abs_max")
    ma, msg, msb = E.fused_quantize_nv_int8(x, h16, gs, rot_size=16,
                                            method="abs_max")
    np.testing.assert_array_equal(np.asarray(na), np.asarray(ma))
    np.testing.assert_array_equal(np.asarray(nsg), np.asarray(msg))
    np.testing.assert_array_equal(np.asarray(nsb), np.asarray(msb))


def test_quantize_mx_int8_fused_multi_ktile():
    """K large enough to force several K grid steps (bk=1024 -> nk=2)
    plus a partial row block (rows=160 with bm=128)."""
    rng = np.random.default_rng(3)
    x, h = randn_bf16(rng, 160, 2048), bf16_hadamard(32)
    pa, psa, psb = KQ.fused_quantize_mx_int8(x, h, rot_size=32,
                                             method="quest")
    ea, esa, esb = E.fused_quantize_mx_int8(x, h, rot_size=32,
                                            method="quest")
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(ea))
    np.testing.assert_array_equal(np.asarray(psa), np.asarray(esa))
    np.testing.assert_array_equal(np.asarray(psb), np.asarray(esb))
