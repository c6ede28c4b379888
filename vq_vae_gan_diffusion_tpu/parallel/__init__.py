from .mesh import (DATA_AXIS, MODEL_AXIS, apply_param_sharding, batch_sharding,
                   create_mesh, fsdp_param_sharding_rules,
                   gpt_param_sharding_rules, pad_to_multiple, replicated,
                   resolve_sharding_rules, shard_batch)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "apply_param_sharding", "batch_sharding",
    "create_mesh", "fsdp_param_sharding_rules", "gpt_param_sharding_rules",
    "pad_to_multiple", "replicated", "resolve_sharding_rules", "shard_batch",
]
