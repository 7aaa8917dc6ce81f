from mimo_unet_tpu.parallel.mesh import (
    batch_sharding,
    image_sharding,
    make_mesh,
    make_mesh_2d,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh", "make_mesh_2d", "batch_sharding", "image_sharding",
    "replicated_sharding", "shard_batch",
]
