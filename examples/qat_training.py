"""Quartet MXFP4 QAT training loop: a 2-layer MLP with every linear
running ``quartet_linear`` (W4A4 forward, clip-mask STE backward),
trained with optax — the flow the reference ships as its backward
kernels + HF Transformers integration (reference README.md:44-51,
quartet_test.py flow), end-to-end under ``jax.grad``.

``grad_mode`` picks the backward arithmetic (qutlass_tpu/nn/linear.py):
``int8`` is the TPU speed-of-light step (all three GEMMs on the int8
MXU, 1.14x vs bf16 pseudoquant QAT on v5e), ``mxfp8`` is reference
parity, ``bf16`` is the exact STE.

    python examples/qat_training.py        # CPU or TPU
"""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

if jax.default_backend() != "tpu":
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import optax

from qutlass_tpu.nn import quartet_linear
from qutlass_tpu.utils import hadamard_matrix


def main(grad_mode: str = "int8", steps: int = 40):
    d_in, d_hidden, d_out, batch = 256, 512, 256, 128
    h = hadamard_matrix(32)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w1": (jax.random.normal(k1, (d_hidden, d_in)) * 0.05
               ).astype(jnp.bfloat16),
        "w2": (jax.random.normal(k2, (d_out, d_hidden)) * 0.05
               ).astype(jnp.bfloat16),
    }
    # a fixed random teacher to regress against
    teacher = jax.random.normal(k3, (d_out, d_in)) * 0.1

    def model(p, x):
        y = quartet_linear(x, p["w1"], h, "quest", grad_mode)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(jnp.bfloat16)
        return quartet_linear(y, p["w2"], h, "quest", grad_mode)

    def loss_fn(p, x, t):
        return jnp.mean((model(p, x).astype(jnp.float32) - t) ** 2)

    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(p, opt_state, x, t):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, t)
        updates, opt_state = opt.update(grads, opt_state)
        p = jax.tree.map(
            lambda w, u: (w.astype(jnp.float32) + u).astype(w.dtype),
            p, updates)
        return p, opt_state, loss

    rng = np.random.default_rng(0)
    first = last = None
    for i in range(steps):
        x = jnp.asarray(rng.standard_normal((batch, d_in)),
                        jnp.bfloat16)
        t = (x.astype(jnp.float32) @ teacher.T)
        params, opt_state, loss = train_step(params, opt_state, x, t)
        if first is None:
            first = float(loss)
        last = float(loss)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.5f}")

    print(f"grad_mode={grad_mode}: loss {first:.5f} -> {last:.5f}")
    assert last < first * 0.5, "QAT training failed to reduce the loss"
    print("qat_training OK")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["int8"]))
