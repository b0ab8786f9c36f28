from .dp import make_parallel_eval_step, make_parallel_train_step
from .mesh import batch_sharding, create_mesh, replicated, shard_batch

__all__ = [
    "batch_sharding", "create_mesh", "replicated", "shard_batch",
    "make_parallel_eval_step", "make_parallel_train_step",
]
