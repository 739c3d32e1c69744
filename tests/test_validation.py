"""Public-API validation-layer tests (reference bindings_utils.h parity)."""
import numpy as np
import jax.numpy as jnp
import pytest

import qutlass_tpu as q
from helpers import bf16_hadamard, randn_bf16


def test_wrong_dtype_rejected():
    x = jnp.ones((4, 64), jnp.float32)
    with pytest.raises(TypeError, match="bfloat16"):
        q.fusedQuantizeMx(x, bf16_hadamard(32))


def test_bad_rotation_size():
    x = jnp.ones((4, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="rotation size"):
        q.fusedQuantizeMx(x, jnp.ones((8, 8), jnp.bfloat16))


def test_non_square_rotation():
    x = jnp.ones((4, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="square"):
        q.fusedQuantizeMx(x, jnp.ones((32, 16), jnp.bfloat16))


def test_k_not_divisible():
    x = jnp.ones((4, 96), jnp.bfloat16)
    with pytest.raises(ValueError, match="divisible"):
        q.fusedQuantizeMx(x, bf16_hadamard(64))


def test_matmul_k_mismatch():
    rng = np.random.default_rng(0)
    a = jnp.ones((4, 32), jnp.uint8)
    b = jnp.ones((4, 64), jnp.uint8)
    sa = jnp.ones((4, 2), jnp.uint8)
    with pytest.raises(ValueError, match="share packed K"):
        q.matmul_mxf4_bf16_tn(a, b, sa, sa, jnp.ones((1,), jnp.float32))


def test_bad_method():
    x = jnp.ones((4, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="invalid method"):
        q.fusedQuantizeMx(x, bf16_hadamard(32), method="bogus")


def test_mask_only_for_quest():
    x = jnp.ones((4, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="return_mask"):
        q.fusedQuantizeMx(x, bf16_hadamard(32), method="abs_max",
                          return_mask=True)
