from .mesh import make_mesh, shard_tile_batch, replicate
from .grid import make_grid_mesh

__all__ = [
    "make_mesh", "shard_tile_batch", "replicate", "make_grid_mesh",
]
