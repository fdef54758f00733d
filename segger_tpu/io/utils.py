"""Boundary geometry helpers: ragged-vertex -> polygon arrays + repair.

Analogue of the reference's shapely-based helpers
(reference: src/segger/io/utils.py:44-159) on plain NumPy polygons.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np


def contours_to_polygons(
    x: np.ndarray, y: np.ndarray, ids: np.ndarray
) -> Tuple[List[str], List[np.ndarray]]:
    """Group flat vertex arrays by id into per-polygon (V, 2) arrays
    (reference: io/utils.py:44-80).  Vertex order within each id is
    preserved.  Returns (unique ids, polygons) in first-appearance order.
    """
    ids = np.asarray(ids)
    # stable grouping preserving original vertex order
    uniq, first_pos, inverse = np.unique(
        ids, return_index=True, return_inverse=True
    )
    order = np.argsort(first_pos, kind="stable")
    verts = np.stack([np.asarray(x), np.asarray(y)], axis=1)
    out_ids, out_polys = [], []
    for oi in order:
        sel = inverse == oi
        poly = verts[sel]
        out_ids.append(str(uniq[oi]))
        out_polys.append(poly)
    return out_ids, out_polys


def resort_coordinates(poly: np.ndarray) -> np.ndarray:
    """Angular re-sort of vertices around the centroid — the reference's
    first-line repair for self-intersecting rings (io/utils.py:105-135)."""
    c = poly.mean(axis=0)
    ang = np.arctan2(poly[:, 1] - c[1], poly[:, 0] - c[0])
    return poly[np.argsort(ang, kind="stable")]


def _is_simple_enough(poly: np.ndarray) -> bool:
    """Cheap validity check: >= 3 distinct vertices and nonzero area."""
    if len(poly) < 3:
        return False
    if len(np.unique(poly, axis=0)) < 3:
        return False
    x, y = poly[:, 0], poly[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return bool(area > 0)


def fix_invalid_geometry(
    polygons: List[np.ndarray],
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Repair invalid polygons: drop consecutive duplicate vertices, then
    angular re-sort if degenerate (reference: io/utils.py:105-159; the
    buffer(0) fallback is GEOS-specific and replaced by the re-sort).

    Returns (repaired polygons, keep mask) — polygons that cannot be
    repaired (e.g. < 3 distinct vertices) are flagged for removal.
    """
    out, keep = [], []
    for poly in polygons:
        poly = np.asarray(poly, dtype=np.float64)
        if len(poly) and (poly[0] == poly[-1]).all():
            poly = poly[:-1]  # drop closing vertex
        # drop consecutive duplicates
        if len(poly) > 1:
            d = np.any(np.diff(poly, axis=0) != 0, axis=1)
            poly = poly[np.concatenate([[True], d])]
        if not _is_simple_enough(poly):
            poly = resort_coordinates(poly) if len(poly) >= 3 else poly
        ok = _is_simple_enough(poly)
        out.append(poly)
        keep.append(ok)
    return out, np.asarray(keep, dtype=bool)
