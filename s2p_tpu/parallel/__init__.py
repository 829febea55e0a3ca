from s2p_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated,
    model_shard_params,
    shard_batch,
    shard_pytree,
    local_device_count,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "model_shard_params",
    "shard_batch",
    "shard_pytree",
    "local_device_count",
]
