"""Minimal WKB (well-known binary) polygon decoder.

MERSCOPE boundary parquet files carry geometries as WKB blobs; the
reference would read them through geopandas/GEOS.  segger-tpu decodes the
polygon subset (Polygon, MultiPolygon, little/big endian, optional Z)
directly into NumPy vertex arrays — the only geometry representation the
framework uses.
"""
from __future__ import annotations

import struct
from typing import Optional

import numpy as np

_POLYGON = 3
_MULTIPOLYGON = 6


def _read_ring(buf: memoryview, off: int, little: bool, dims: int):
    (n,) = struct.unpack_from("<I" if little else ">I", buf, off)
    off += 4
    pts = np.frombuffer(
        buf, dtype="<f8" if little else ">f8", count=n * dims, offset=off
    ).reshape(n, dims)
    return pts[:, :2].astype(np.float64), off + 8 * n * dims


def _read_polygon(buf: memoryview, off: int, little: bool, dims: int):
    (n_rings,) = struct.unpack_from("<I" if little else ">I", buf, off)
    off += 4
    exterior = None
    for r in range(n_rings):
        ring, off = _read_ring(buf, off, little, dims)
        if r == 0:
            exterior = ring
        # interior rings (holes) are dropped: containment tests operate
        # on the exterior shell, matching the reference's practical use
    return exterior, off


def wkb_to_polygon(blob: bytes) -> Optional[np.ndarray]:
    """Decode one WKB geometry to its (largest) exterior ring (V, 2).

    Returns None for empty/unsupported geometries.
    """
    buf = memoryview(blob)
    off = 0
    little = buf[off] == 1
    off += 1
    (gtype,) = struct.unpack_from("<I" if little else ">I", buf, off)
    off += 4
    has_z = bool(gtype & 0x80000000) or (1000 <= (gtype % 10000) // 1000)
    base = gtype & 0xFF
    # ISO WKB: type + 1000 for Z
    if gtype >= 1000 and gtype < 4000:
        base = gtype % 1000
        has_z = gtype >= 1000
    dims = 3 if has_z else 2

    if base == _POLYGON:
        poly, _ = _read_polygon(buf, off, little, dims)
        return poly
    if base == _MULTIPOLYGON:
        (n_polys,) = struct.unpack_from("<I" if little else ">I", buf, off)
        off += 4
        best, best_area = None, -1.0
        for _ in range(n_polys):
            # each sub-polygon has its own endianness + type header
            sub_little = buf[off] == 1
            off += 1
            (sub_type,) = struct.unpack_from(
                "<I" if sub_little else ">I", buf, off
            )
            off += 4
            sub_dims = 3 if (sub_type % 10000) >= 1000 else 2
            poly, off = _read_polygon(buf, off, sub_little, sub_dims)
            if poly is not None and len(poly) >= 3:
                x, y = poly[:, 0], poly[:, 1]
                area = 0.5 * abs(
                    np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))
                )
                if area > best_area:
                    best, best_area = poly, area
        return best
    return None
