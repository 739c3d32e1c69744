"""Sharding tests on the 8-device virtual CPU mesh.

Validates the shard-transparency contract (SURVEY.md §2.10): quantized
ops partition freely along M; the TP linear runs under shard_map with
identical results to single-device execution.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import qutlass_tpu as q
from qutlass_tpu.parallel import make_mesh, shard_quantized_linear
from helpers import bf16_hadamard, randn_bf16

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 devices")


@needs_8
def test_quantize_row_sharded_matches_single():
    rng = np.random.default_rng(0)
    mesh = make_mesh({"dp": 8})
    x = randn_bf16(rng, 8 * 64, 512)
    h = bf16_hadamard(32)

    ref_q, ref_s = q.fusedQuantizeMx(x, h, method="quest")

    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    from qutlass_tpu.parallel.compat import shard_map
    from functools import partial

    @partial(shard_map, mesh=mesh, in_specs=(P("dp", None),),
             out_specs=(P("dp", None), P("dp", None)), check_rep=False)
    def qs(blk):
        pk, sc = q.fusedQuantizeMx(blk, h, method="quest")
        return pk, sc[: blk.shape[0], : blk.shape[1] // 32]

    pk, sc = qs(xs)
    np.testing.assert_array_equal(np.asarray(pk), np.asarray(ref_q))
    np.testing.assert_array_equal(np.asarray(sc),
                                  np.asarray(ref_s)[: 8 * 64, : 512 // 32])


@needs_8
def test_tp_linear_matches_single_device():
    rng = np.random.default_rng(0)
    mesh = make_mesh({"dp": 2, "tp": 4})
    m, n, k = 2 * 32, 4 * 64, 512
    x = randn_bf16(rng, m, k, scale=1.0)
    w = randn_bf16(rng, n, k, scale=0.05)
    h = bf16_hadamard(32)

    apply = shard_quantized_linear(mesh, w, h)
    y = apply(jax.device_put(x, NamedSharding(mesh, P("dp", None))))

    xq, xs = q.fusedQuantizeMx(x, h, method="quest")
    wq, ws = q.fusedQuantizeMx(w, h, method="quest")
    y_ref = q.matmul_mxf4_bf16_tn(xq, wq, xs[:m, :k // 32], ws[:n, :k // 32],
                                  jnp.ones((1,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_ref, np.float32))


@needs_8
def test_kshard_gemm_psum():
    """K-sharded GEMM: local partial dots + psum reproduce the full GEMM."""
    from functools import partial
    from qutlass_tpu.parallel.compat import shard_map

    rng = np.random.default_rng(0)
    mesh = make_mesh({"k": 8})
    m, n, k = 64, 64, 8 * 256
    x = randn_bf16(rng, m, k)
    w = randn_bf16(rng, n, k)
    h = bf16_hadamard(32)

    xq, xs = q.fusedQuantizeMx(x, h, method="quest")
    wq, ws = q.fusedQuantizeMx(w, h, method="quest")
    xs, ws = xs[:m, :k // 32], ws[:n, :k // 32]
    ref = q.matmul_mxf4_bf16_tn(xq, wq, xs, ws, jnp.ones((1,), jnp.float32))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, "k"), P(None, "k"), P(None, "k"), P(None, "k")),
             out_specs=P(None, None), check_rep=False)
    def sharded(aq, bq, asf, bsf):
        part = q.matmul_mxf4_bf16_tn(aq, bq, asf, bsf,
                                     jnp.ones((1,), jnp.float32))
        return jax.lax.psum(part.astype(jnp.float32), "k")

    out = sharded(xq, wq, xs, ws)
    # per-shard bf16 partial sums round before the psum: tolerance scales
    # with the output magnitude
    ref32 = np.asarray(ref, np.float32)
    atol = 0.02 * float(np.abs(ref32).std() + 1.0)
    np.testing.assert_allclose(np.asarray(out), ref32, rtol=5e-2, atol=atol)


def test_pershard_quantize_equals_sliced_full_bytes():
    """The sharding-legality claim at the byte level (docs/SCALING.md):
    quantizing a K- or M-shard emits exactly the bytes of the
    full-tensor quantization restricted to that shard, because rotation
    chunks and scale groups never straddle shard boundaries."""
    from qutlass_tpu.ops import emulation as E
    from helpers import bf16_hadamard, randn_bf16
    rng = np.random.default_rng(3)
    h = bf16_hadamard(32)
    x = randn_bf16(rng, 16, 256)

    fq, fs = E.fused_quantize_mx(x, h, rot_size=32, method="quest",
                                 layout="kmajor")     # [K/2, M], [K/32, M]

    # K-shard (tp row-parallel operand): halves along K
    for i, sl in enumerate((slice(0, 128), slice(128, 256))):
        sq, ss = E.fused_quantize_mx(x[:, sl], h, rot_size=32,
                                     method="quest", layout="kmajor")
        np.testing.assert_array_equal(np.asarray(sq),
                                      np.asarray(fq)[i * 64:(i + 1) * 64])
        np.testing.assert_array_equal(np.asarray(ss),
                                      np.asarray(fs)[i * 4:(i + 1) * 4])

    # M-shard (dp/sp operand): halves along rows
    for i, sl in enumerate((slice(0, 8), slice(8, 16))):
        sq, ss = E.fused_quantize_mx(x[sl], h, rot_size=32,
                                     method="quest", layout="kmajor")
        np.testing.assert_array_equal(np.asarray(sq),
                                      np.asarray(fq)[:, i * 8:(i + 1) * 8])
        np.testing.assert_array_equal(np.asarray(ss),
                                      np.asarray(fs)[:, i * 8:(i + 1) * 8])
