from .host_lib import (available, dequantize_mx, e2m1_encode, e4m3_encode,
                       e8m0_encode, quantize_mx_golden, to_blocked_swizzled)

__all__ = ["available", "quantize_mx_golden", "dequantize_mx",
           "to_blocked_swizzled", "e2m1_encode", "e4m3_encode", "e8m0_encode"]
