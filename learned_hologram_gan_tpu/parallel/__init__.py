"""Multi-device scaling: meshes, shardings, distance-plane parallelism."""

from .mesh import (
    batch_sharding,
    initialize_distributed,
    make_hybrid_mesh,
    make_mesh,
    pad_batch_to_devices,
    replicate_state,
    replicated,
    shard_batch,
    shard_distance_stack,
)

__all__ = [
    "batch_sharding",
    "initialize_distributed",
    "make_hybrid_mesh",
    "make_mesh",
    "pad_batch_to_devices",
    "replicate_state",
    "replicated",
    "shard_batch",
    "shard_distance_stack",
]
