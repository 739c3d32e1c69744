"""Parallelism-strategy tests on the 8-device virtual CPU mesh.

Each strategy (SP, PP, EP) must reproduce its single-device reference
computation and stay differentiable end-to-end.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from qutlass_tpu.parallel.compat import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from qutlass_tpu.nn import quartet_linear
from qutlass_tpu.parallel import make_mesh
from qutlass_tpu.parallel import strategies as S
from helpers import bf16_hadamard, randn_bf16

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 devices")


def _ref_mlp(x, w1, w2, h):
    h1 = quartet_linear(x, w1, h, "quest")
    h1 = jax.nn.relu(h1.astype(jnp.float32)).astype(jnp.bfloat16)
    return quartet_linear(h1, w2, h, "quest")


@pytest.mark.slow
@needs_8
def test_sp_mlp_matches_tp_and_single():
    rng = np.random.default_rng(0)
    mesh = make_mesh({"tp": 8})
    s, d, inter = 8 * 16, 256, 8 * 64
    x = randn_bf16(rng, s, d)
    w1 = randn_bf16(rng, inter, d, scale=0.05)
    w2 = randn_bf16(rng, d, inter, scale=0.05)
    h = bf16_hadamard(32)

    ref = _ref_mlp(x, w1, w2, h)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("tp", None), P("tp", None), P(None, "tp")),
             out_specs=P("tp", None), check_rep=False)
    def run(x_seq, w1l, w2l):
        return S.sp_mlp(x_seq, w1l, w2l, h, "tp")

    y = run(x, w1, w2)
    # per-shard bf16 partial outputs round before the scatter-sum:
    # tolerance scales with the output magnitude (as in test_sharding)
    ref32 = np.asarray(ref, np.float32)
    atol = 0.05 * float(np.abs(ref32).std() + 1.0)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref32,
                               rtol=5e-2, atol=atol)


@pytest.mark.slow
@needs_8
def test_gpipe_matches_sequential_and_grads():
    rng = np.random.default_rng(1)
    mesh = make_mesh({"pp": 8})
    n_stages, n_mb, mb, d = 8, 4, 16, 256
    h = bf16_hadamard(32)
    ws = randn_bf16(rng, n_stages, d, d, scale=0.05)
    mbs = randn_bf16(rng, n_mb, mb, d)

    def stage(w, x):
        return quartet_linear(x, w, h, "quest")

    # sequential reference
    ref = mbs
    for i in range(n_stages):
        ref = jax.vmap(lambda x: stage(ws[i], x))(ref)

    @partial(shard_map, mesh=mesh,
             in_specs=(P("pp", None, None), P(None, None, None)),
             out_specs=P(None, None, None), check_rep=False)
    def run(w_local, mbs):
        return S.gpipe(lambda p, x: stage(p[0], x), w_local, mbs,
                       axis="pp", n_stages=n_stages)

    out = run(ws, mbs)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))

    # differentiability: grads flow to every stage's weights
    def loss(ws):
        return jnp.mean(run(ws, mbs).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(ws)
    norms = np.asarray(jnp.linalg.norm(
        g.astype(jnp.float32).reshape(n_stages, -1), axis=-1))
    assert np.all(norms > 0), norms


@pytest.mark.slow
@needs_8
def test_moe_ep_runs_and_matches_local():
    rng = np.random.default_rng(2)
    mesh = make_mesh({"ep": 8})
    n_exp, m, d, inter, cap = 8, 64, 256, 128, 64
    h = bf16_hadamard(32)
    router = randn_bf16(rng, d, n_exp).astype(jnp.float32)
    w1 = randn_bf16(rng, n_exp, inter, d, scale=0.05)
    w2 = randn_bf16(rng, n_exp, d, inter, scale=0.05)
    x = randn_bf16(rng, m, d)

    # single-device reference with the same routing math
    logits = x.astype(jnp.float32) @ router
    dispatch, gate = S.moe_dispatch_top1(logits, cap)
    buf = jnp.einsum("mec,md->ecd", dispatch,
                     x.astype(jnp.float32)).astype(jnp.bfloat16)
    outs = [_ref_mlp(buf[e], w1[e], w2[e], h) for e in range(n_exp)]
    back = jnp.stack(outs).astype(jnp.float32)
    ref = (jnp.einsum("mec,ecd->md", dispatch, back)
           * gate[:, None]).astype(jnp.bfloat16)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None), P(None, None), P("ep", None, None),
                       P("ep", None, None)),
             out_specs=P(None, None), check_rep=False)
    def run(x, router, w1l, w2l):
        return S.moe_mlp_ep(x, router, w1l, w2l, h, axis="ep",
                            n_experts=n_exp, capacity=cap)

    y = run(x, router, w1, w2)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_zero_adam_matches_replicated():
    """ZeRO-1 Adam (psum_scatter grads -> shard-local moments ->
    all_gather params) must reproduce replicated Adam on the mean
    gradient exactly; optimizer state per rank is 1/dp-sized."""
    from functools import partial

    from qutlass_tpu.parallel.compat import shard_map
    from qutlass_tpu.parallel.sharding import make_mesh
    from qutlass_tpu.parallel.strategies import (zero_adam_init,
                                                 zero_adam_step)

    if jax.device_count() < 4:
        pytest.skip("needs a 4-device mesh")
    mesh = make_mesh({"dp": 4})
    P = jax.sharding.PartitionSpec
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (13, 7)).astype(jnp.bfloat16),
              "b": jax.random.normal(key, (5,)).astype(jnp.float32)}
    # per-rank local grads: [dp, ...] sharded on the leading axis
    gkey = jax.random.PRNGKey(1)
    gw = jax.random.normal(gkey, (4, 13, 7)).astype(jnp.float32)
    gb = jax.random.normal(gkey, (4, 5)).astype(jnp.float32)

    @partial(shard_map, mesh=mesh,
             in_specs=({"w": P(None, None), "b": P(None)},
                       {"w": P("dp"), "b": P("dp")}),
             out_specs=({"w": P(None, None), "b": P(None)},
                        {"m": {"w": P("dp"), "b": P("dp")},
                         "v": {"w": P("dp"), "b": P("dp")}, "t": P()}),
             check_rep=False)
    def two_steps(p, g):
        st = zero_adam_init(p, "dp")
        g_local = jax.tree.map(lambda x: x[0], g)
        p, st = zero_adam_step(p, g_local, st, axis="dp", lr=1e-2)
        p, st = zero_adam_step(p, jax.tree.map(lambda x: 2 * x, g_local),
                               st, axis="dp", lr=1e-2)
        return p, st

    newp, st = two_steps(params, {"w": gw, "b": gb})
    # optimizer state leaves are 1/dp per rank (global shape = padded)
    assert st["m"]["w"].shape[0] * 1 == -(-91 // 4) * 4  # padded to dp
    # replicated reference: plain Adam on the mean gradient, fp32
    def ref_adam(p, gs, steps=2):
        import ml_dtypes
        m = {k: np.zeros(v.size) for k, v in p.items()}
        v_ = {k: np.zeros(val.size) for k, val in p.items()}
        out = {k: np.asarray(p[k], np.float32).reshape(-1) for k in p}
        for t in range(1, steps + 1):
            for k in p:
                g = np.asarray(gs[k], np.float32).mean(axis=0).reshape(-1) * t
                m[k] = 0.9 * m[k] + 0.1 * g
                v_[k] = 0.999 * v_[k] + 0.001 * g * g
                upd = 1e-2 * (m[k] / (1 - 0.9 ** t)) / \
                    (np.sqrt(v_[k] / (1 - 0.999 ** t)) + 1e-8)
                out[k] = out[k] - upd.astype(np.float32)
                # params round to their dtype after every step
                out[k] = out[k].astype(
                    np.asarray(p[k]).dtype).astype(np.float32)
        return out

    ref = ref_adam(params, {"w": gw, "b": gb})
    np.testing.assert_allclose(
        np.asarray(newp["w"], np.float32).reshape(-1),
        ref["w"].astype(np.float32).astype(
            np.asarray(params["w"]).dtype).astype(np.float32),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(newp["b"]).reshape(-1), ref["b"],
                               rtol=1e-5, atol=1e-6)
