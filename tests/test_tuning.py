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
