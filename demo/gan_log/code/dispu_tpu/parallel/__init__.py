"""Device-mesh construction and sharding rules (the framework's
'distributed backend' — the reference has none, SURVEY.md §2.3)."""

from dispu_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch"]
