from .mesh import make_mesh, single_device_mesh
from .sharding import (
    batch_sharding,
    jit_with_mesh,
    replicate_state,
    replicated,
    shard_batch,
    shard_task_batch,
    task_batch_sharding,
)

__all__ = [
    "make_mesh",
    "single_device_mesh",
    "batch_sharding",
    "jit_with_mesh",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_task_batch",
    "task_batch_sharding",
]
