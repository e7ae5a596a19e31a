"""Distribution layer: device meshes, sharded transforms, halo exchange.

The reference has zero distributed components (SURVEY.md §2.9); this layer
is the TPU-native feature-add: batch data-parallelism via NamedSharding,
spatial tile parallelism via shard_map with ring ppermute halo exchange,
and multi-host initialisation helpers.
"""
from pytorch_wavelets_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, spatial_sharding, initialize_multihost,
)
from pytorch_wavelets_tpu.parallel.halo import (  # noqa: F401
    halo_exchange_1d,
)
from pytorch_wavelets_tpu.parallel.sharded import (  # noqa: F401
    sharded_dwt2d, sharded_idwt2d, sharded_dwt1d, sharded_idwt1d,
    sharded_dtcwt2d, sharded_idtcwt2d,
    sharded_scat_j1, sharded_scat_j2, sharded_swt2d, sharded_iswt2d,
)

__all__ = [
    "make_mesh", "data_sharding", "spatial_sharding",
    "initialize_multihost", "halo_exchange_1d",
    "sharded_dwt2d", "sharded_idwt2d", "sharded_dwt1d", "sharded_idwt1d",
    "sharded_dtcwt2d", "sharded_idtcwt2d", "sharded_scat_j1",
    "sharded_scat_j2", "sharded_swt2d", "sharded_iswt2d",
]
