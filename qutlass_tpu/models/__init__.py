from .transformer import (ModelConfig, QWEN3_8B, QWEN3_14B, QWEN3_32B,
                          LLAMA31_8B, LLAMA31_70B, init_params, forward,
                          quantize_model_weights, tiny_config)

__all__ = ["ModelConfig", "QWEN3_8B", "QWEN3_14B", "QWEN3_32B", "LLAMA31_8B",
           "LLAMA31_70B", "init_params", "forward", "quantize_model_weights",
           "tiny_config"]
