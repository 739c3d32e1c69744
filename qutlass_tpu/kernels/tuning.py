"""Tile-size selection tables.

The reference keys CUTLASS tile shapes on problem M and compile-time
arch (gemm.cu:193-244).  Here the tables key on problem shape and the
TPU generation (``jax.devices()[0].device_kind``): tile *shapes* were
tuned on v5e; the per-kernel VMEM budgets they must respect come from
:func:`vmem_budgets`, which scales with the generation's VMEM size.
Unknown generations get the v5e budgets — correct (if conservative)
anywhere with at least v5e's VMEM.
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


# Per-kernel working-set budgets (bytes): (accumulator stack cap,
# total tile cap).  v5e values are MEASURED sweep winners (exp_gemmtiles*,
# exp_quanttiles); v5p / v6e have ~2x the v5e VMEM per core, so their
# caps scale accordingly — tile shapes stay the v5e winners until swept
# on real hardware, the caps only bound what is *legal* to request.
_VMEM_BUDGETS = {
    "TPU v5 lite":  (5_400_000, 9_000_000),
    "TPU v5e":      (5_400_000, 9_000_000),
    "TPU v5":       (10_800_000, 18_000_000),   # v5p
    "TPU v5p":      (10_800_000, 18_000_000),
    "TPU v6 lite":  (10_800_000, 18_000_000),   # v6e (Trillium)
    "TPU v6e":      (10_800_000, 18_000_000),
    "TPU v4":       (5_400_000, 9_000_000),
}

_DEFAULT_BUDGET = (5_400_000, 9_000_000)


def vmem_budgets(kind: str | None = None) -> tuple[int, int]:
    """(accumulator cap, total tile cap) in bytes for ``kind``
    (defaults to the active device's kind)."""
    return _VMEM_BUDGETS.get(kind if kind is not None else device_kind(),
                             _DEFAULT_BUDGET)


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


def quantize_int8_tiles(rows: int, k: int,
                        kind: str | None = None) -> tuple[int, int]:
    """(bm, bk) for the fused quantize+int8-encode kernels.

    The int8 output block spans the whole K ([k, bm], revisited across
    the K grid axis) and is double-buffered by the pipeline, so bm is
    bounded by 2*k*bm bytes against the total VMEM cap; bk only sizes
    the per-step f32 intermediates.
    """
    _, tile_cap = vmem_budgets(kind)
    if k % 256 == 0:
        bk = largest_divisor_multiple(k, 256, 1024)
    else:
        bk = k
    if rows >= 256:
        bm = 256
    elif rows >= 128:
        bm = 128
    else:
        bm = rows

    def cost(bm, bk):
        # 2x revisited int8 out block + ~3 live f32 [bk, bm] blocks
        return 2 * k * bm + 12 * bk * bm

    # relieve the per-step intermediates first (bk doesn't change the
    # dominant out-block term, and shrinking it keeps bm lane-legal for
    # K around 30k where halving bm would force the two-pass fallback)
    while cost(bm, bk) > tile_cap and k % 256 == 0 and bk > 256:
        nk = largest_divisor_multiple(k, 256, bk // 2)
        if nk == bk:
            break
        bk = nk
    while bm > 8 and bm % 2 == 0 and cost(bm, bk) > tile_cap:
        bm //= 2
    return bm, bk


def quantize_int8_oneshot_bm(rows: int, k: int,
                             kind: str | None = None) -> int:
    """Row-block size for the single-shot whole-K quantize+int8 kernel,
    or 0 when the shape doesn't fit.

    The kernel holds the entire K extent of one row block at once: the
    bf16 input block (double-buffered) and the int8 output block
    (double-buffered); the rotation is recomputed chunk-wise rather
    than stashed, so only ~5 f32 chunk intermediates are live — so
    feasibility is a straight VMEM sum.  bm is 256 when rows divide
    (fastest measured), else 128 (the K-major output's lane dim must be
    128-divisible), else the whole row count when below 128.  Covers K
    up to ~20k at bm=128 (all qwen3/llama hidden + most intermediate
    sizes); larger K falls back to the revisit kernel / two-pass
    composition.
    """
    if k % 128 != 0:
        return 0
    # dedicated caps: the oneshot holds no weight tiles, so it can take
    # more than the GEMM tile budget.  Mosaic's default 16 MB scoped-
    # VMEM limit used to be the silent ceiling; the kernels now raise
    # it (oneshot_vmem_limit), so the caps below are the MEASURED
    # regimes, not a compiler constraint:
    #   * bm=256 stays within 16 MB (tile_cap*16//9) — the
    #     exp_oneshot_variants_r3-validated regime (K <= ~10k).
    #   * bm=128 extends to 24 MB (tile_cap*8//3): the whole-K kernel
    #     at K=25600 (21 MB) beats the revisit kernel AND the two-pass
    #     composition — MX 577 vs 984 us, NV 1205 vs 1701 us at M=2048
    #     (results_oneshot_largek_r5.log); covers every reference-table
    #     K incl. llama's 28672 (23.3 MB).  Larger K (~50k+) keeps the
    #     two-pass fallback: the unrolled 2*K/512-chunk kernel body is
    #     a Mosaic compile-time risk there and is unmeasured.
    _, tile_cap = vmem_budgets(kind)
    cap256 = tile_cap * 16 // 9
    cap128 = tile_cap * 8 // 3
    # bm=256 measured 18% faster than 128 at M=2048 K=5120 (98 vs
    # 119 us, exp_oneshot_variants_r3) — prefer it when rows divide
    if rows % 256 == 0 and oneshot_vmem_need(k, 256) <= cap256:
        return 256
    bm = 128 if rows >= 128 else rows
    if bm % 128 != 0 and bm != rows:
        return 0
    return bm if oneshot_vmem_need(k, bm) <= cap128 else 0


def oneshot_vmem_need(k: int, bm: int) -> int:
    """Scoped-VMEM bytes the whole-K oneshot quantize kernel requests:
    bf16 input block (double-buffered) + int8 output block
    (double-buffered) + ~5 live f32 chunk intermediates."""
    return (2 * 2 + 2 * 1) * k * bm + 20 * min(k, 512) * bm


def oneshot_vmem_limit(k: int, bm: int) -> int:
    """``vmem_limit_bytes`` for the oneshot quantize kernels.

    Mosaic's DEFAULT scoped-VMEM limit is 16 MB — the silent cap that
    kept the oneshot off K >= ~20k (r4's weak large-K cells).  v5e has
    128 MB/core of physical VMEM; raising the limit to the kernel's
    actual need (+25% slack, capped at 100 MB) lets the whole-K kernel
    run at K=25600/28672 where it beats both the revisit kernel and the
    two-pass composition (benchmarks/results_oneshot_largek_r5.log).
    """
    need = oneshot_vmem_need(k, bm)
    # 2x headroom: the modeled need tracks the MX kernel closely
    # (18.95M measured vs 21M modeled at K=25600 bm=128) but the NV
    # kernel's stashed per-chunk scale intermediates push its true
    # scoped allocation to ~38M there — the limit only PERMITS, the
    # compiler allocates what the kernel actually uses.
    return min(100 << 20, max(16 << 20, 2 * need))


def fused_linear_tiles(m: int, n: int, k: int,
                       kind: str | None = None) -> tuple[int, int, int]:
    """(bm, bn, bk) for the single-kernel quantize+GEMM linear (v2).

    v2 keeps one f32 accumulator slot per N-block alive across the
    whole K sweep — total bm x n x 4 bytes of VMEM — plus the
    quantized-activation scratch and the decoded weight tile, so bm is
    capped by n.  Production regime is decode / small prefill
    (m <= ~64); larger m should use the composed pipeline.
    """
    acc_cap, tile_cap = vmem_budgets(kind)
    # accumulator stack: bm * n * 4 bytes total regardless of bn
    bm = min(m, 256, max(8, (acc_cap // (4 * n)) // 8 * 8))
    # mirror the GEMM's measured-best shape: wide N, shallow K
    if n * bm * 4 <= acc_cap:
        bn = n
    elif n % 128 == 0:
        bn = largest_divisor_multiple(n, 128, max(128, acc_cap // (4 * bm)))
    else:
        bn = n
    bk = 256 if k % 256 == 0 else k
    # decoded weight tile + quantize intermediates
    while (bn > 128 and bn % 2 == 0
           and bk * (6 * bm + 4 * bn) > tile_cap * 2 // 3):
        bn //= 2
    return bm, bn, bk


def gemm_tiles(m: int, n: int, k: int, packed: bool,
               kind: str | None = None) -> tuple[int, int, int]:
    """(bm, bn, bk) for the block-scaled GEMMs.

    Small-M (decode) shapes take narrow M tiles — the role the
    reference's separate "ada" kernel plays (gemm_ada.cu:29-135).
    """
    del packed
    # v5e sweep (every M in {16..2048}, Qwen3-32B layer): bm = 256,
    # bn as wide as the f32 accumulator budget allows (full N when it
    # fits), bk = 256 — the shallow-K / wide-N shape pipelines weight
    # DMA deeply and overlaps the VPU decode under the MXU.  With
    # realistically cycled weights: M=2048 GEMM 637 us (fake-decode
    # floor 620, XLA bf16 569); M=256: 91 (bk 512/1024 worse); M<=64:
    # ~50, VPU-decode-bound on the weight stream (exp_gemm_anatomy*,
    # exp_m256, exp_smallm3).  Block lane dims must be 128-divisible
    # or == the array dim; bk % 256 == 0 (or == K) keeps the scale
    # block's sublane dim legal.
    acc_cap, tile_cap = vmem_budgets(kind)
    bm = m if m <= 256 else 256
    if n * bm * 4 <= acc_cap:
        bn = n
    elif n % 128 == 0:
        bn = largest_divisor_multiple(n, 128, max(128, acc_cap // (4 * bm)))
    else:
        bn = n
    bk = 256 if k % 256 == 0 else k
    # VMEM guard: decoded bf16 tiles + accumulator (covers bk == K
    # fallbacks and huge-N cases)
    while (bn > 128 and bn % 2 == 0
           and bk * (bm + bn) * 2 + bm * bn * 4 > tile_cap):
        bn //= 2
    return bm, bn, bk
