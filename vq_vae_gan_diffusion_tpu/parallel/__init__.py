from .mesh import (DATA_AXIS, MODEL_AXIS, apply_param_sharding, batch_sharding,
                   create_mesh, gpt_param_sharding_rules, pad_to_multiple,
                   replicated, shard_batch)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "apply_param_sharding", "batch_sharding",
    "create_mesh", "gpt_param_sharding_rules", "pad_to_multiple", "replicated",
    "shard_batch",
]
