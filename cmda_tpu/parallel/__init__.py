from .mesh import (
    make_mesh, batch_sharding, replicated, shard_batch,
    make_parallel_train_step,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch",
           "make_parallel_train_step"]
