from .sharding import (make_mesh, quantized_op_sharding_rules,
                       shard_quantized_linear, with_row_sharding)

__all__ = ["make_mesh", "with_row_sharding", "shard_quantized_linear",
           "quantized_op_sharding_rules"]
