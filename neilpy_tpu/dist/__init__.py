"""Multi-chip execution layer: 2-D device meshes, ICI halo exchange,
sharded raster pipelines, and host-orchestrated out-of-core tiling.

The reference's only scaling mechanism was tile-with-overlap
``apply_parallel`` (SURVEY.md §2.5); here spatial sharding over a
``jax.sharding.Mesh`` is the native execution model.
"""

from .api import (make_mesh, pad_to_mesh, sharded_apply,
                  sharded_geomorphons, sharded_openness, sharded_skyview,
                  sharded_hillshade, sharded_rastergi,
                  sharded_local_morans_i, sharded_morans_i)
from .halo import halo_exchange_2d, block_origin
from .smrf import (sharded_smrf, sharded_springs_fill,
                   sharded_progressive_filter)
from .tiling import tiled_apply, apply_parallel, TileCheckpoint

__all__ = [
    "make_mesh", "pad_to_mesh", "sharded_apply", "sharded_geomorphons",
    "sharded_skyview",
    "sharded_openness", "sharded_hillshade", "halo_exchange_2d",
    "block_origin", "sharded_smrf", "sharded_springs_fill",
    "sharded_progressive_filter", "tiled_apply", "TileCheckpoint",
    "sharded_rastergi", "sharded_local_morans_i", "sharded_morans_i",
]
