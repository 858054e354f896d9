"""Device mesh + sharding utilities."""

from .mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)
