from . import gemm, quantize, tuning

__all__ = ["gemm", "quantize", "tuning"]
