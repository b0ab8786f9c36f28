from .distributed import (
    initialize_distributed,
    is_main_process,
    make_global_batch,
    process_count,
    process_index,
)
from .dp import make_parallel_eval_step, make_parallel_train_step
from .mesh import batch_sharding, create_mesh, replicated, shard_batch
from .serving import make_sharded_batch_serving_fn, shard_streams

__all__ = [
    "batch_sharding", "create_mesh", "replicated", "shard_batch",
    "make_parallel_eval_step", "make_parallel_train_step",
    "initialize_distributed", "is_main_process", "make_global_batch",
    "process_count", "process_index",
    "make_sharded_batch_serving_fn", "shard_streams",
]
