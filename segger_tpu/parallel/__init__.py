from .mesh import make_mesh, shard_tile_batch, replicate

__all__ = ["make_mesh", "shard_tile_batch", "replicate"]
