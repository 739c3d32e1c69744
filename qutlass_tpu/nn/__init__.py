from .linear import (QuantizedLinear, quantize_weights_mx, quartet_linear,
                     quartet_linear_reference_flow)

try:
    from .flax_layers import QuartetDense, swap_dense_kernels
except Exception:  # pragma: no cover - flax optional
    QuartetDense = None
    swap_dense_kernels = None

__all__ = ["QuantizedLinear", "quartet_linear", "quantize_weights_mx",
           "quartet_linear_reference_flow", "QuartetDense",
           "swap_dense_kernels"]
