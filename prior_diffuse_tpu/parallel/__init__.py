from prior_diffuse_tpu.parallel import distributed
from prior_diffuse_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch_arrays,
    device_count,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch_arrays",
    "device_count",
]
