from .graph import TileGraph, pad_axis

__all__ = ["TileGraph", "pad_axis"]
