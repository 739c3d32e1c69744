"""Serialization + CUDA-interop export tests."""
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from qutlass_tpu import io as qio
from qutlass_tpu.formats import golden as G
from helpers import bf16_hadamard, randn_bf16


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    w = randn_bf16(rng, 256, 512, scale=0.05)
    h = bf16_hadamard(32)
    wqt, wst = q.fusedQuantizeMx(w, h, layout="kmajor")
    tree = {"wqt": wqt, "wst": wst}
    p = str(tmp_path / "weights.npz")
    qio.save_quantized(p, tree, {"model": "test"})
    loaded = qio.load_quantized(p, tree)
    np.testing.assert_array_equal(np.asarray(loaded["wqt"]), np.asarray(wqt))
    np.testing.assert_array_equal(np.asarray(loaded["wst"]), np.asarray(wst))


@pytest.mark.slow
def test_save_load_quantized_model_tree(tmp_path):
    """Roundtrip a real quantize_model_weights tree in every stored
    weight format (MX int8, NV int8, fp4) — the dtypes the serving
    stack actually persists (int8, f32 scales, uint8 bytes, bf16)."""
    import jax
    from qutlass_tpu.models import (forward, init_params,
                                    quantize_model_weights, tiny_config)

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    h = bf16_hadamard(32)
    for fmt, wf in (("mx", "int8"), ("nv", "int8"), ("mx", "fp4")):
        qp = quantize_model_weights(cfg, params, h, fmt=fmt,
                                    weight_format=wf)
        p = str(tmp_path / f"{fmt}_{wf}.npz")
        qio.save_quantized(p, qp, {"fmt": fmt, "weight_format": wf})
        loaded = qio.load_quantized(p, qp)
        for a, b in zip(jax.tree_util.tree_leaves(qp),
                        jax.tree_util.tree_leaves(loaded)):
            assert a.dtype == b.dtype, (fmt, wf, a.dtype, b.dtype)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        toks = jnp.zeros((1, 4), jnp.int32)
        out = forward(cfg, loaded, toks, h, quantized=True)
        assert np.isfinite(np.asarray(out, np.float32)).all(), (fmt, wf)


def test_import_export_quantized_weight_roundtrip():
    """export_quantized_weight -> import_*_weight reproduces the
    directly-quantized stored dict bitwise (both formats, MX and NV),
    including the int8 evaluator operands."""
    import jax
    from qutlass_tpu.models.transformer import quantize_weight

    rng = np.random.default_rng(7)
    w = randn_bf16(rng, 64, 256, scale=0.05)
    h = bf16_hadamard(32)

    mx = quantize_weight(w, h=h, method="quest", fmt="mx",
                         weight_format="both")
    packed, scales = qio.export_quantized_weight(mx)
    assert packed.shape == (64, 128) and scales.shape == (64, 8)
    imp = qio.import_mxfp4_weight(packed, scales, weight_format="both")
    for key in ("wqt", "wst", "wi8", "wsb"):
        np.testing.assert_array_equal(np.asarray(imp[key]),
                                      np.asarray(mx[key]), err_msg=key)
    # reference's padded scale alloc buffer is accepted too
    padded = np.zeros((128, 8), np.uint8)
    padded[:64, :8] = np.asarray(scales)
    imp_p = qio.import_mxfp4_weight(packed, padded, weight_format="fp4")
    np.testing.assert_array_equal(np.asarray(imp_p["wst"]),
                                  np.asarray(mx["wst"]))

    nv = quantize_weight(w, h=h, method="abs_max", fmt="nv",
                         weight_format="both")
    npk, nsc, ngs = qio.export_quantized_weight(nv)
    assert nsc.shape == (64, 16)
    nimp = qio.import_nvfp4_weight(npk, nsc, ngs, weight_format="both")
    for key in ("wqt", "wst", "nvi8", "nvsb"):
        np.testing.assert_array_equal(np.asarray(nimp[key]),
                                      np.asarray(nv[key]), err_msg=key)
    assert float(nimp["gs"]) == float(nv["gs"])

    with pytest.raises(ValueError, match="int8"):
        qio.export_quantized_weight({"wi8": mx["wi8"], "wsb": mx["wsb"]})

    # to_blocked 1-D flattening of the padded buffer imports correctly
    # (regression: a naive reshape regrouped rows by the unpadded count)
    padded128 = np.zeros((128, 8), np.uint8)
    padded128[:64, :8] = np.asarray(scales)
    flat = padded128.reshape(-1)
    imp_f = qio.import_mxfp4_weight(packed, flat, weight_format="fp4")
    np.testing.assert_array_equal(np.asarray(imp_f["wst"]),
                                  np.asarray(mx["wst"]))

    # int32-packed (GPTQ-style) operands are rejected with a clear error
    with pytest.raises(TypeError, match="uint8"):
        qio.import_mxfp4_weight(np.asarray(packed).astype(np.int32),
                                scales, weight_format="fp4")


def test_export_scales_for_cuda_matches_reference_swizzle():
    rng = np.random.default_rng(0)
    rows, cols = 200, 10            # forces padding to 256 x 12
    sb = jnp.asarray(rng.integers(0, 255, (rows, cols), dtype=np.uint8))
    out = np.asarray(qio.export_scales_for_cuda(sb, k=cols * 32))
    padded = np.zeros((256, 12), np.uint8)
    padded[:rows, :cols] = np.asarray(sb)
    np.testing.assert_array_equal(out, G.to_blocked_swizzled(padded))
