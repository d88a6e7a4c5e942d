from ionflux.parallel.mesh import (
    make_mesh,
    shard_along,
    replicate,
    pad_to_multiple,
    sharded_map,
)

__all__ = [
    "make_mesh",
    "shard_along",
    "replicate",
    "pad_to_multiple",
    "sharded_map",
]
