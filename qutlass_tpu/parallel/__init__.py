from . import strategies
from .sharding import (make_mesh, quantized_op_sharding_rules,
                       shard_quantized_linear, with_row_sharding)
from .strategies import gpipe, moe_mlp_ep, sp_mlp, tp_mlp

__all__ = ["make_mesh", "with_row_sharding", "shard_quantized_linear",
           "quantized_op_sharding_rules", "strategies",
           "tp_mlp", "sp_mlp", "gpipe", "moe_mlp_ep"]
