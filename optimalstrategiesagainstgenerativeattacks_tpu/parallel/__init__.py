from optimalstrategiesagainstgenerativeattacks_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    param_shardings,
    shard_batch,
    adjust_batch_size,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "param_shardings",
    "shard_batch",
    "adjust_batch_size",
]
