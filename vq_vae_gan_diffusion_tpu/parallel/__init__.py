from .mesh import (DATA_AXIS, MODEL_AXIS, apply_param_sharding, batch_sharding,
                   create_mesh, fsdp_param_sharding_rules,
                   gpt_param_sharding_rules, pad_to_multiple, replicated,
                   resolve_sharding_rules, shard_batch)
from .pipeline import (PIPE_AXIS, create_pipeline_mesh,
                       make_pipeline_train_step, pipeline_apply,
                       pipelined_gpt_logits, shard_stacked,
                       stack_block_params, unstack_block_params)

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "PIPE_AXIS", "apply_param_sharding",
    "batch_sharding", "create_mesh", "create_pipeline_mesh",
    "fsdp_param_sharding_rules", "gpt_param_sharding_rules",
    "make_pipeline_train_step", "pad_to_multiple", "pipeline_apply",
    "pipelined_gpt_logits", "replicated", "resolve_sharding_rules",
    "shard_batch", "shard_stacked", "stack_block_params",
    "unstack_block_params",
]
