"""Pallas-backed op implementations (TPU compiled path).

Forward quantize and the block-scaled GEMMs run as Mosaic kernels; the
QAT backward ops currently route through the XLA emulation graph on
device (they are prototype-grade in the reference too —
quartet_bwd_sm120.cu) and will gain fused kernels.
"""
from ..kernels.gemm import (matmul_mxf4_bf16_kmajor, matmul_mxf4_bf16_tn,
                            matmul_mxf8_bf16_nn, matmul_mxf8_bf16_tn,
                            matmul_nvf4_bf16_tn)
from ..kernels.quantize import fused_quantize_mx, fused_quantize_nv
from .emulation import (backward_bf16_square_double_mxfp8, backward_qt_bf16,
                        backward_t_bf16, mxfp4_transpose_mxfp8)

__all__ = [
    "fused_quantize_mx", "fused_quantize_nv",
    "matmul_mxf4_bf16_tn", "matmul_mxf4_bf16_kmajor", "matmul_nvf4_bf16_tn",
    "matmul_mxf8_bf16_tn", "matmul_mxf8_bf16_nn",
    "backward_t_bf16", "backward_qt_bf16",
    "backward_bf16_square_double_mxfp8", "mxfp4_transpose_mxfp8",
]
