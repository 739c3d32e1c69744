from .linear import (QuantizedLinear, quantize_weights_mx, quartet_linear,
                     quartet_linear_reference_flow)

__all__ = ["QuantizedLinear", "quartet_linear", "quantize_weights_mx",
           "quartet_linear_reference_flow"]
