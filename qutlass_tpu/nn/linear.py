"""Quantized linear layers: MXFP4 W4A4 inference + Quartet QAT training.

The training flow wires the reference's op graph (SURVEY.md §3.4,
assembled from qutlass/__init__.py ops and tests/quartet_test.py):

    forward:  xq, xs, mask = fusedQuantizeMx(x,  H, quest, mask)
              wq, ws       = fusedQuantizeMx(w,  H, quest)
              y  = matmul_mxf4_bf16_tn(xq, wq, xs, ws, 1.0)
    backward: gq' = backward_square_double_scaled(dY)      # MXFP8 pts, bf16
              w8' = mxfp4_transpose_scaled(wq, ws)         # W^T -> MXFP8 pts
              dXh = gq' @ w8'^T            (bf16 MXU dot == mxf8 TN GEMM)
              dX  = (dXh * clip_mask) @ H_blockdiag^T        # Quartet STE
              x8' = mxfp4_transpose_scaled(xq, xs)         # X^T -> MXFP8 pts
              dWh = gq'^T @ x8'^T          (bf16 MXU dot == mxf8 NN GEMM)
              dW  = dWh @ H_blockdiag^T

    The primed operands are the reference's MXFP8 tensors pre-decoded to
    bf16 (e4m3 x pow2 is exact in bf16), so the backward GEMMs hit the
    MXU at full bf16 rate; the public byte-level ops
    (backward_bf16_square_double_mxfp8 / mxfp4_transpose_mxfp8 /
    matmul_mxf8_bf16_{tn,nn}) remain the reference-parity surface.

Both weight and activation gradients flow through ``jax.grad`` with a
single ``custom_vjp``; everything quantized stays in uint8 on device.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

import qutlass_tpu as q
from ..ops import int8path as _i8
from ..utils import round_up


def _unrotate(g: jax.Array, h: jax.Array) -> jax.Array:
    """Apply the inverse (transpose) rotation per contiguous gs-chunk.

    When K is 128-divisible the rotation is lifted to the 128x128
    block-diagonal bf16 operand (kron(I, H^T)) — one full-width bf16
    MXU matmul instead of a contraction-``rot`` fp32 dot that runs at a
    fraction of peak (the same lift the quantizer uses,
    kernels/quantize.py:_h128).  Gradients tolerate the bf16 operand
    (fp32 accumulation; H entries are exact powers of two times signs).
    """
    rot = h.shape[-1]
    k = g.shape[-1]
    if k % 128 == 0:
        from ..kernels.quantize import _h128
        ht128 = _h128(h, rot).T                    # bf16 [128, 128]
        gr = g.reshape(-1, 128).astype(jnp.bfloat16)
        out = jax.lax.dot_general(gr, ht128, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return out.reshape(g.shape)
    gr = g.reshape(-1, rot).astype(jnp.float32)
    ht = h.reshape(rot, rot).astype(jnp.float32).T
    out = jax.lax.dot_general(gr, ht, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.reshape(g.shape)


def _unpack_mask_bits(mask: jax.Array, k: int) -> jax.Array:
    """uint8 [..., K/8] -> f32 0/1 [..., K] (bit i of byte j = elem 8j+i)."""
    m = mask.astype(jnp.int32)
    bits = jnp.stack([(m >> i) & 1 for i in range(8)], axis=-1)
    return bits.reshape(*mask.shape[:-1], k).astype(jnp.float32)


def quantize_weights_mx(w: jax.Array, h: jax.Array, method: str = "quest"):
    """Quantize a weight matrix [N, K] once (cache for inference/training)."""
    wq, ws = q.fusedQuantizeMx(w, h, method=method)
    return wq, ws


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def quartet_linear(x: jax.Array, w: jax.Array, h: jax.Array,
                   method: str = "quest") -> jax.Array:
    """y = q(x·H) @ q(w·H)^T with Quartet MXFP4 W4A4 quantization.

    x: [M, K] bf16, w: [N, K] bf16, h: [gs, gs] rotation.
    Differentiable in x and w (MXFP8 backward GEMMs, clip-mask STE).
    """
    y, _ = _quartet_fwd_impl(x, w, h, method)
    return y


def _quartet_fwd_impl(x, w, h, method):
    """Forward on the kmajor composed path (zero layout transforms);
    residuals stay in the kmajor layout the backward kernels consume."""
    if method == "quest":
        xqt, xst, mask_t = q.fusedQuantizeMx(x, h, method=method,
                                             return_mask=True,
                                             layout="kmajor")
    else:
        xqt, xst = q.fusedQuantizeMx(x, h, method=method, layout="kmajor")
        mask_t = None
    wqt, wst = q.fusedQuantizeMx(w, h, method=method, layout="kmajor")
    alpha = jnp.full((1,), 1.0 if method == "quest" else 1.0 / 9.0, jnp.float32)
    # forward contraction on the int8 MXU (~2x bf16 peak; bit-exact for
    # quantizer-produced operands — ops/int8path.py); residuals keep the
    # kmajor byte layout the backward kernels consume
    xi, sx, _ = _i8.encode_int8_planes(xqt, xst)
    wi, sw, _ = _i8.encode_int8_planes(wqt, wst)
    y = _i8.matmul_mxf4_bf16_int8_kk(xi, wi, sx, sw, alpha)
    return y, (xqt, xst, mask_t, wqt, wst)


def _quartet_fwd(x, w, h, method):
    y, res = _quartet_fwd_impl(x, w, h, method)
    return y, (res, h, x.shape, w.shape)


def _quartet_bwd(method, carry, gy):
    """Quartet backward on the scaled-bf16 fast path.

    The MXFP8 operands are produced pre-decoded (``e4m3_value * pow2``
    is exact in bf16 — backward_square_double_scaled /
    mxfp4_transpose_scaled), so the dgrad/wgrad contractions run as
    plain bf16 MXU matmuls at full speed instead of through the
    decode-bound mxf8 Pallas GEMMs (82 vs 193 TF/s on v5e).  Same
    quantization points as the reference op graph; zero padding needs
    no scale patching because pad elements decode to 0.
    """
    (xqt, xst, mask_t, wqt, wst), h, xshape, wshape = carry
    m, k = xshape
    gy = gy.astype(jnp.bfloat16)

    gq_s = q.backward_square_double_scaled(gy)           # [Mp, N] bf16

    # dgrad: dXh = dY @ dq(wq)  -> mask STE -> unrotate
    w8_s = q.mxfp4_transpose_scaled_kmajor(wqt, wst)     # [K, N] bf16
    dxh = jax.lax.dot_general(gq_s, w8_s, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)[:m]
    if method == "quest":
        # 0/1 mask in bf16: the multiply is exact, and skipping the f32
        # round-trip halves the traffic of this memory-bound stage
        dxh = dxh * _unpack_mask_bits(mask_t.T, k).astype(jnp.bfloat16)
    dx = _unrotate(dxh, h).astype(jnp.bfloat16)

    # wgrad: dWh = dY^T @ dq(xq) -> unrotate
    x8_s = q.mxfp4_transpose_scaled_kmajor(xqt, xst)     # [K, M] bf16
    dwh = jax.lax.dot_general(gq_s[:m], x8_s, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
    dw = _unrotate(dwh, h).astype(jnp.bfloat16)

    return dx, dw, jnp.zeros_like(h)


quartet_linear.defvjp(_quartet_fwd, _quartet_bwd)


def quartet_linear_reference_flow(x, w, h, method: str = "quest"):
    """Non-differentiable forward (inference): pre-quantized weight path."""
    xq, xs = q.fusedQuantizeMx(x, h, method=method)
    wq, ws = q.fusedQuantizeMx(w, h, method=method)
    return q.matmul_mxf4_bf16_tn(xq, wq, xs, ws, jnp.ones((1,), jnp.float32))


class QuantizedLinear:
    """Functional MXFP4 W4A4 linear with a cached quantized weight.

    Usage:
        lin = QuantizedLinear.create(w, h)        # quantize once
        y = lin(x)                                # prefill/decode
    This is the inference-path analogue of the reference's HF-integration
    layer swap (README.md:50-51).  Weights and activations travel in the
    K-major TPU-native layout — no layout transforms on the hot path.
    """

    def __init__(self, wqt, wst, h, n, k, method="quest"):
        self.wqt, self.wst, self.h = wqt, wst, h
        self.n, self.k = n, k
        self.method = method

    @classmethod
    def create(cls, w: jax.Array, h: jax.Array, method: str = "quest"):
        n, k = w.shape
        wqt, wst = q.fusedQuantizeMx(w, h, method=method, layout="kmajor")
        return cls(wqt, wst, h, n, k, method)

    def __call__(self, x: jax.Array) -> jax.Array:
        shape = x.shape
        x2 = x.reshape(-1, self.k)
        # composed kmajor quantize + GEMM wins at every M on v5e
        xqt, xst = q.fusedQuantizeMx(x2, self.h, method=self.method,
                                     layout="kmajor")
        y = q.matmul_mxf4_bf16_kmajor(xqt, self.wqt, xst, self.wst,
                                      jnp.ones((1,), jnp.float32))
        return y.reshape(*shape[:-1], self.n)


jax.tree_util.register_pytree_node(
    QuantizedLinear,
    lambda l: ((l.wqt, l.wst, l.h), (l.n, l.k, l.method)),
    lambda aux, ch: QuantizedLinear(ch[0], ch[1], ch[2], aux[0], aux[1], aux[2]),
)
