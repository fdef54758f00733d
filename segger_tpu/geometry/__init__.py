from .query import points_in_polygons, points_in_polygon
from .morphology import polygon_area, polygon_props
from .quadtree import QuadTree

__all__ = [
    "points_in_polygons",
    "points_in_polygon",
    "polygon_area",
    "polygon_props",
    "QuadTree",
]
