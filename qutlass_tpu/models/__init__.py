from . import continuous, hf_loader, moe, moe_tp, serving, serving_tp
from .continuous import ContinuousBatcher, LocalEngine
from .moe import MoeConfig, QWEN3_MOE_30B_A3B, tiny_moe_config
from .serving import (decode_step, generate, init_cache, prefill,
                      prefill_chunked, prefill_step, sample_logits)
from .serving_tp import TPEngine
from .transformer import (ModelConfig, QWEN3_8B, QWEN3_14B, QWEN3_32B,
                          LLAMA31_8B, LLAMA31_70B, calibrate_nv_gsx,
                          init_params, forward, quantize_model_weights,
                          tiny_config)

__all__ = ["ModelConfig", "QWEN3_8B", "QWEN3_14B", "QWEN3_32B", "LLAMA31_8B",
           "LLAMA31_70B", "init_params", "forward", "quantize_model_weights",
           "tiny_config", "calibrate_nv_gsx", "serving", "prefill",
           "decode_step", "generate",
           "init_cache", "sample_logits", "prefill_chunked", "prefill_step",
           "hf_loader", "moe", "moe_tp",
           "serving_tp", "continuous", "ContinuousBatcher", "LocalEngine",
           "TPEngine", "MoeConfig",
           "QWEN3_MOE_30B_A3B", "tiny_moe_config"]
