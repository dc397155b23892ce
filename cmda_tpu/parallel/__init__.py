from .mesh import (
    make_mesh, batch_sharding, replicated, shard_batch,
    make_parallel_train_step, opt_state_sharding, tp_state_sharding,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "make_parallel_train_step", "opt_state_sharding",
           "tp_state_sharding"]
