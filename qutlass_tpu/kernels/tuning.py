"""Tile-size selection tables.

The reference keys CUTLASS tile shapes on problem M and compile-time
arch (gemm.cu:193-244).  Here the table keys on the TPU generation
(``jax.devices()[0].device_kind``) and problem shape; entries were tuned
on v5e and are safe defaults elsewhere.
"""
from __future__ import annotations

from functools import lru_cache

import jax

from ..utils import largest_divisor_multiple


@lru_cache(maxsize=1)
def device_kind() -> str:
    try:
        return jax.devices()[0].device_kind
    except Exception:  # pragma: no cover
        return "cpu"


def quantize_tiles(rows: int, k: int) -> tuple[int, int]:
    """(bm, bk) for the fused-quantize kernel.  K % 128 == 0 required.

    bk must be a multiple of 256 (so the packed-output lane dim bk/2 is
    128-divisible) or the whole K (block == array dim is always legal).
    """
    if k % 256 == 0:
        bk = largest_divisor_multiple(k, 256, 4096)
    else:
        bk = k
    if rows >= 256:
        bm = 256
    elif rows >= 128:
        bm = 128
    else:
        bm = rows
    # keep the fp32 intermediate under ~2.5 MB
    while bm > 8 and bm % 2 == 0 and bm * bk * 4 > 2_621_440:
        bm //= 2
    return bm, bk


def fused_linear_tiles(m: int, n: int, k: int) -> tuple[int, int, int]:
    """(bm, bn, bk) for the single-kernel quantize+GEMM linear (v2).

    v2 keeps one f32 accumulator slot per N-block alive across the
    whole K sweep — total bm x n x 4 bytes of VMEM — plus the
    quantized-activation scratch and the decoded weight tile, so bm is
    capped by n.  Production regime is decode / small prefill
    (m <= ~64); larger m should use the composed pipeline.
    """
    # accumulator stack: bm * n * 4 bytes
    bm = min(m, 256, max(8, (5_500_000 // (4 * n)) // 8 * 8))
    bn = n
    # decode regime (small bm): wide N tiles amortize per-program cost
    for t in ((1024, 512, 256, 128) if bm <= 64 else (512, 256, 128)):
        if n % t == 0:
            bn = t
            break
    bk = largest_divisor_multiple(k, 256, 1024) if k % 256 == 0 else k
    # decoded weight tile + quantize intermediates
    while bk > 256 and bk % 2 == 0 and bk * (6 * bm + 4 * bn) > 6_000_000:
        bk //= 2
    return bm, bn, bk


def gemm_tiles(m: int, n: int, k: int, packed: bool) -> tuple[int, int, int]:
    """(bm, bn, bk) for the block-scaled GEMMs.

    Small-M (decode) shapes take narrow M tiles — the role the
    reference's separate "ada" kernel plays (gemm_ada.cu:29-135).
    """
    del packed
    # M/N live on the lane dim of the K-major operand tiles: a block's
    # lane size must be 128-divisible or equal to the whole array dim.
    # Large tiles amortize the fp4->bf16 decode (each B tile is decoded
    # ceil(M/bm) times and vice versa).
    def pick(d):
        if d < 128:
            return d
        for t in (1024, 512, 256):
            if d % t == 0 and d >= t:
                return t
        return 256 if d % 256 == 0 else 128

    bm, bn = pick(m), pick(n)
    # decode regime: one full-N column of programs streams B exactly
    # once with deep DMA pipelining — measured 28 vs 36 us at M=64 and
    # 58 vs 68 us at M=16 (v5e, N=K=5120) vs 1024-wide tiles
    if m <= 64 and 256 * (bm + n) * 2 + bm * n * 4 <= 8_400_000:
        bn = n
    # v5e sweep (M=2048, Qwen3-32B layer): 1024x1024 tiles amortize the
    # fp4 decode best (60.8 TF vs 54.8 at 512x512).
    # bk must keep the scale block's sublane dim (bk/32) 8-divisible on
    # real hardware: bk % 256 == 0 or bk == K (block == array is legal).
    bk = largest_divisor_multiple(k, 256, 1024) if k % 256 == 0 else k
    if bn == n and m <= 64 and k % 256 == 0:
        bk = 256          # the measured-best decode config
    # VMEM guard: decoded bf16 tiles + packed inputs + fp32 accumulator
    while (bk > 256 and k % 256 == 0
           and bk * (bm + bn) * 2 + bm * bn * 4 > 8_400_000):
        nxt = largest_divisor_multiple(k, 256, bk - 256)
        if nxt >= bk:
            break
        bk = nxt
    while bm * bn * 4 > 4_500_000 and bm >= 2 * bn and bm % 2 == 0:
        bm //= 2
    while bm * bn * 4 > 4_500_000 and bn % 2 == 0:
        bn //= 2
    return bm, bn, bk
