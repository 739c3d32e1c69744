"""Tile-table invariants: every returned block shape must satisfy the
Mosaic legality rules (lane dim 128-divisible or == array dim; sublane
dim 8-divisible or == array dim) for all the operand/output blocks the
kernels derive from it, across realistic shape ranges."""
import pytest

from qutlass_tpu.kernels.tuning import (fused_linear_tiles, gemm_tiles,
                                        quantize_tiles)

MS = [1, 7, 8, 16, 64, 128, 200, 256, 504, 1024, 2048, 65536]
NKS = [256, 512, 4096, 5120, 10752, 11008, 12288, 25600, 51200, 57344, 8192]


def _lane_ok(block, dim):
    return block == dim or block % 128 == 0


def _sublane_ok(block, dim):
    return block == dim or block % 8 == 0


@pytest.mark.parametrize("m", MS)
@pytest.mark.parametrize("n", NKS[:6])
def test_gemm_tiles_legal(m, n):
    for k in NKS:
        bm, bn, bk = gemm_tiles(m, n, k, packed=True)
        assert bk % 32 == 0 and k % bk == 0, (m, n, k, bk)
        # packed operand blocks [bk/2, bm] / [bk/2, bn]
        assert _sublane_ok(bk // 2, k // 2)
        assert _lane_ok(bm, m) and _lane_ok(bn, n), (m, n, k, bm, bn)
        # scale blocks [bk/32, bm] (MX) and [bk/16, bn] (NV)
        assert _sublane_ok(bk // 32, k // 32), (k, bk)
        assert _sublane_ok(bk // 16, k // 16), (k, bk)
        # accumulator + decoded-tile VMEM stays bounded
        assert bk * (bm + bn) * 2 + bm * bn * 4 <= 12_000_000, (m, n, k)


@pytest.mark.parametrize("m", MS[:-1])
def test_fused_tiles_legal(m):
    for n in NKS:
        for k in (256, 5120, 10752):
            bm, bn, bk = fused_linear_tiles(m, n, k)
            assert _lane_ok(bn, n) and bk % 32 == 0
            assert _sublane_ok(bk // 2, k // 2)
            assert _sublane_ok(bk // 32, k // 32)
            # accumulator stack is bm x n x 4 in total
            assert bm * n * 4 <= 6_000_000 or bm == 8, (m, n, bm)


KINDS = ["TPU v5 lite", "TPU v5p", "TPU v6 lite", "made-up-device"]


@pytest.mark.parametrize("kind", KINDS)
def test_generation_keyed_budgets(kind):
    """Tiles key on the TPU generation; unknown kinds get the v5e
    (conservative) budgets.  Legality must hold for every generation."""
    from qutlass_tpu.kernels.tuning import vmem_budgets
    acc_cap, tile_cap = vmem_budgets(kind)
    assert acc_cap >= 5_400_000 and tile_cap >= 9_000_000
    for m in (16, 256, 2048):
        for n, k in ((5120, 5120), (51200, 5120), (5120, 25600)):
            bm, bn, bk = gemm_tiles(m, n, k, packed=True, kind=kind)
            assert _lane_ok(bm, m) and _lane_ok(bn, n)
            assert bk * (bm + bn) * 2 + bm * bn * 4 <= tile_cap * 4 // 3
            fb = fused_linear_tiles(m, n, k, kind=kind)
            assert _lane_ok(fb[1], n)
    # bigger-VMEM generations may never pick SMALLER tiles than v5e
    for m, n, k in ((2048, 51200, 5120), (2048, 5120, 25600)):
        v5e = gemm_tiles(m, n, k, packed=True, kind="TPU v5 lite")
        big = gemm_tiles(m, n, k, packed=True, kind=kind)
        assert big[0] * big[1] >= v5e[0] * v5e[1], (kind, v5e, big)


@pytest.mark.parametrize("rows", MS[:-1])
def test_quantize_tiles_legal(rows):
    for k in NKS:
        bm, bk = quantize_tiles(rows, k)
        assert k % bk == 0
        # packed output block [bk/2, bm]: lane dim = bm
        assert _lane_ok(bm, rows), (rows, bm)
        # kmajor packed block lane dim 128-divisible or == rows handled
        # by bm; scale block [bk/32, bm] sublane dim:
        assert _sublane_ok(bk // 32, k // 32), (k, bk)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("rows", MS[:-1])
def test_quantize_int8_tiles_legal(kind, rows):
    """Fused quantize+int8-encode tiles: the revisited [k, bm] int8 out
    block is double-buffered, so 2*k*bm plus the per-step f32 blocks
    must fit the generation's tile cap; bk keeps the scale-block
    sublane legality."""
    from qutlass_tpu.kernels.tuning import (quantize_int8_tiles,
                                            vmem_budgets)
    _, tile_cap = vmem_budgets(kind)
    for k in NKS:
        bm, bk = quantize_int8_tiles(rows, k, kind=kind)
        assert k % bk == 0
        lane_ok = bm % 128 == 0 or bm == rows
        fits = 2 * k * bm + 12 * bk * bm <= tile_cap
        if not (lane_ok and fits):
            # exactly the cases _int8_tiles_infeasible routes to the
            # bitwise-equal two-pass fallback (on the default device
            # kind; other kinds have looser caps)
            from qutlass_tpu.kernels.quantize import _int8_tiles_infeasible
            if kind in (None, "TPU v5 lite", "made-up-device"):
                assert _int8_tiles_infeasible(rows, k, bm, bk), \
                    (kind, rows, k, bm, bk)
            continue
        assert _sublane_ok(bk // 32, k // 32), (k, bk)


def test_backward_pick_bk_pow2():
    """Mosaic compile-pathology guard (VERDICT r3 item 7): backward
    kernel K/N tiles must be POWERS OF TWO.  The (N=512, K=768)
    >10-minute Mosaic compile was triggered by picking the full
    non-pow2 extent (768) as the tile; pow2 tiles on the same shape
    compile normally (benchmarks/exp_bwd_compile_r4.py)."""
    from qutlass_tpu.kernels.backward import _pick_bk
    for k in (128, 256, 384, 640, 768, 896, 1536, 4096, 5120,
              8192, 10752, 25600, 51200, 57344):
        for cap in (512, 1024):
            bk = _pick_bk(k, cap)
            assert bk & (bk - 1) == 0, (k, cap, bk)      # pow2
            assert bk % 128 == 0 and k % bk == 0 and bk <= cap
    # the pathological production pick is gone
    assert _pick_bk(768) == 256
    # pow2 model dims keep their full-speed picks
    assert _pick_bk(4096) == 1024 and _pick_bk(25600) == 1024


def test_oneshot_covers_reference_table_ks():
    """r5 routing contract: the whole-K oneshot quantize kernel fires
    at EVERY reference-table K (the r4 NV-below-bf16 regression and the
    weak MX K=25600 cell both came from the 16 MB scoped-VMEM default
    capping it out at K >= ~20k — results_oneshot_largek_r5_v2.log),
    and its requested vmem limit stays within the v5e 128 MB/core."""
    from qutlass_tpu.kernels.tuning import (oneshot_vmem_limit,
                                            oneshot_vmem_need,
                                            quantize_int8_oneshot_bm)

    for k in (4096, 5120, 8192, 14336, 25600, 28672):
        bm = quantize_int8_oneshot_bm(2048, k, kind="TPU v5 lite")
        assert bm in (128, 256), (k, bm)
        lim = oneshot_vmem_limit(k, bm)
        assert oneshot_vmem_need(k, bm) <= lim <= 100 << 20, (k, bm, lim)
    # huge K keeps the two-pass fallback (unrolled-chunk compile risk)
    assert quantize_int8_oneshot_bm(2048, 51200, kind="TPU v5 lite") == 0
    # sub-128 row counts still use their full extent
    assert quantize_int8_oneshot_bm(64, 25600, kind="TPU v5 lite") == 64
