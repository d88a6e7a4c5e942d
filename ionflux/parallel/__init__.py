from ionflux.parallel.mesh import (
    make_mesh,
    shard_along,
    replicate,
    pad_to_multiple,
    sharded_map,
)
from ionflux.parallel.multihost import (
    init_multihost,
    global_mesh,
    scatter_global,
    gather_global,
)

__all__ = [
    "make_mesh",
    "shard_along",
    "replicate",
    "pad_to_multiple",
    "sharded_map",
    "init_multihost",
    "global_mesh",
    "scatter_global",
    "gather_global",
]
