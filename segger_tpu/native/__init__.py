"""Native (C++) spatial core: lazy-compiled, ctypes-bound.

The reference delegates its spatial hot paths to cuSpatial/cuML CUDA
libraries; segger-tpu's host equivalents live in ``csrc/spatial.cpp``
(uniform-grid hash join, fixed-radius kNN, Morton codes) and are
compiled on first use with the system toolchain.  Everything has a
NumPy fallback — the native core is a performance layer, not a
correctness dependency.
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "spatial.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    """Compile (once, content-hashed cache) and load the native core."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SEGGER_TPU_NO_NATIVE"):
        return None
    if not _SRC.exists():
        return None
    try:
        digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
        cache = Path(
            os.environ.get(
                "SEGGER_TPU_CACHE",
                Path.home() / ".cache" / "segger_tpu",
            )
        )
        cache.mkdir(parents=True, exist_ok=True)
        so = cache / f"_spatial_{digest}.so"
        if not so.exists():
            # per-process tmp: concurrent builders (multi-process
            # launches) must not interleave writes into one file
            tmp = so.with_suffix(f".tmp.{os.getpid()}.so")
            cmd = [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                "-fPIC", str(_SRC), "-o", str(tmp),
            ]
            logger.info("building native spatial core: %s", " ".join(cmd))
            res = subprocess.run(
                cmd, capture_output=True, text=True, timeout=300
            )
            if res.returncode != 0:
                logger.warning(
                    "native build failed, using NumPy fallback:\n%s",
                    res.stderr[-2000:],
                )
                return None
            os.replace(tmp, so)
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            # a corrupt cached .so would otherwise disable the native
            # core forever; drop it so the next process rebuilds
            so.unlink(missing_ok=True)
            raise
        lib.sgt_points_in_polygons.restype = ctypes.c_int64
        lib.sgt_points_in_boxes.restype = ctypes.c_int64
        lib.sgt_common_neighbor_counts.restype = ctypes.c_int64
        lib.sgt_version.restype = ctypes.c_int
        assert lib.sgt_version() == 3
        _LIB = lib
    except Exception as e:  # pragma: no cover
        logger.warning("native core unavailable (%s); NumPy fallback", e)
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_lib() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def points_in_polygons(
    points: np.ndarray,
    polygons,
    distances: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Grid-hash spatial join; returns (point_idx, polygon_idx)."""
    lib = _build_lib()
    if lib is None:
        raise ImportError("native spatial core not available")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n_polys = len(polygons)
    offsets = np.zeros(n_polys + 1, dtype=np.int64)
    for i, p in enumerate(polygons):
        offsets[i + 1] = offsets[i] + len(p)
    verts = (
        np.ascontiguousarray(
            np.concatenate([np.asarray(p, np.float64) for p in polygons])
        )
        if n_polys
        else np.zeros((0, 2))
    )
    dists = (
        np.ascontiguousarray(distances, dtype=np.float64)
        if distances is not None
        else np.zeros(n_polys)
    )
    capacity = max(len(pts) * 2, 1024)
    while True:
        out_pt = np.empty(capacity, dtype=np.int64)
        out_poly = np.empty(capacity, dtype=np.int64)
        count = lib.sgt_points_in_polygons(
            _ptr(pts, ctypes.c_double), ctypes.c_int64(len(pts)),
            _ptr(verts, ctypes.c_double), _ptr(offsets, ctypes.c_int64),
            ctypes.c_int64(n_polys), _ptr(dists, ctypes.c_double),
            _ptr(out_pt, ctypes.c_int64), _ptr(out_poly, ctypes.c_int64),
            ctypes.c_int64(capacity),
        )
        if count <= capacity:
            return out_pt[:count].copy(), out_poly[:count].copy()
        capacity = count + 1024


def grid_knn(
    points: np.ndarray,
    max_k: int,
    max_dist: float = np.inf,
    query: Optional[np.ndarray] = None,
    return_dist: bool = False,
):
    """Fixed-radius kNN neighbor table (nq, k), -1 padded."""
    lib = _build_lib()
    if lib is None:
        raise ImportError("native spatial core not available")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    q = pts if query is None else np.ascontiguousarray(
        query, dtype=np.float64
    )
    if max_k <= 0:
        raise ValueError(f"max_k must be positive, got {max_k}")
    # pre-filled padding: the C side returns early for empty inputs
    # without touching the buffers (np.empty would hand back garbage
    # indices that pass the >= 0 validity filter downstream)
    out = np.full((len(q), max_k), -1, dtype=np.int64)
    dist = np.full((len(q), max_k), np.inf, dtype=np.float64) \
        if return_dist else None
    lib.sgt_grid_knn(
        _ptr(pts, ctypes.c_double), ctypes.c_int64(len(pts)),
        _ptr(q, ctypes.c_double), ctypes.c_int64(len(q)),
        ctypes.c_int32(max_k), ctypes.c_double(max_dist),
        _ptr(out, ctypes.c_int64),
        _ptr(dist, ctypes.c_double) if return_dist else None,
    )
    return (out, dist) if return_dist else out


def points_in_boxes(
    points: np.ndarray,
    boxes: np.ndarray,
    margin: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Multi-membership join of points against margin-expanded boxes
    (the prediction-halo labeling hot path)."""
    lib = _build_lib()
    if lib is None:
        raise ImportError("native spatial core not available")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    bx = np.ascontiguousarray(boxes, dtype=np.float64)
    capacity = max(len(pts) * 2, 1024)
    while True:
        out_pt = np.empty(capacity, dtype=np.int64)
        out_box = np.empty(capacity, dtype=np.int64)
        count = lib.sgt_points_in_boxes(
            _ptr(pts, ctypes.c_double), ctypes.c_int64(len(pts)),
            _ptr(bx, ctypes.c_double), ctypes.c_int64(len(bx)),
            ctypes.c_double(margin),
            _ptr(out_pt, ctypes.c_int64), _ptr(out_box, ctypes.c_int64),
            ctypes.c_int64(capacity),
        )
        if count <= capacity:
            return out_pt[:count].copy(), out_box[:count].copy()
        capacity = count + 1024


def common_neighbor_counts(
    indptr: np.ndarray,
    indices: np.ndarray,
    eu: np.ndarray,
    ev: np.ndarray,
) -> np.ndarray:
    """Per-edge common-neighbor counts |N(u) & N(v)| of an undirected
    simple graph in CSR form (row indices must be sorted).

    The PhenoGraph Jaccard stage's hot op (replaces the full
    ``(A @ A).multiply(A)`` SpGEMM, which is O(n*k^2) memory).  Native:
    OpenMP sorted-merge per edge.  Fallback: chunked padded-broadcast
    intersection in NumPy.
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    eu = np.ascontiguousarray(eu, dtype=np.int64)
    ev = np.ascontiguousarray(ev, dtype=np.int64)
    out = np.zeros(len(eu), dtype=np.int64)
    if len(eu) == 0:
        return out
    lib = _build_lib()
    if lib is not None:
        lib.sgt_common_neighbor_counts(
            _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int64),
            _ptr(eu, ctypes.c_int64), _ptr(ev, ctypes.c_int64),
            ctypes.c_int64(len(eu)), _ptr(out, ctypes.c_int64),
        )
        return out
    # NumPy fallback: pad rows to max degree with sentinel values that
    # can never match between the two sides (-1 vs -2), then count
    # pairwise equalities per edge in bounded chunks.
    deg = np.diff(indptr)
    kmax = int(deg.max()) if len(deg) else 0
    n = len(deg)
    pad = np.full((n, kmax), -1, dtype=np.int64)
    rows = np.repeat(np.arange(n), deg)
    offs = np.arange(len(indices)) - np.repeat(indptr[:-1], deg)
    pad[rows, offs] = indices
    chunk = max(1, 4_000_000 // max(1, kmax * kmax))
    for s in range(0, len(eu), chunk):
        u = pad[eu[s:s + chunk]]
        v = pad[ev[s:s + chunk]].copy()
        v[v < 0] = -2
        out[s:s + chunk] = (
            (u[:, :, None] == v[:, None, :]).sum(axis=(1, 2))
        )
    return out


def morton_codes(points: np.ndarray) -> np.ndarray:
    """Z-order codes for spatial-locality sorting."""
    lib = _build_lib()
    if lib is None:
        # NumPy fallback
        pts = np.asarray(points, dtype=np.float64)
        lo = pts.min(axis=0)
        hi = pts.max(axis=0)
        scale = np.where(hi > lo, (2**31 - 1) / (hi - lo), 0)
        g = ((pts - lo) * scale).astype(np.uint64)

        def spread(v):
            v &= np.uint64(0xFFFFFFFF)
            v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
            v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
            v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
            return v

        return spread(g[:, 0]) | (spread(g[:, 1]) << np.uint64(1))
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty(len(pts), dtype=np.uint64)
    lib.sgt_morton_codes(
        _ptr(pts, ctypes.c_double), ctypes.c_int64(len(pts)),
        _ptr(out, ctypes.c_uint64),
    )
    return out


def morton_decode(codes: np.ndarray) -> np.ndarray:
    """Z-order codes -> (N, 2) integer grid coordinates (the analogue of
    the reference's Numba ``keys_to_coordinates``,
    reference: src/segger/geometry/quadtree.py:56-94)."""
    v = np.asarray(codes, dtype=np.uint64)

    def compact(x):
        x &= np.uint64(0x5555555555555555)
        x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
        x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return x

    gx = compact(v.copy())
    gy = compact(v >> np.uint64(1))
    return np.stack([gx, gy], axis=1).astype(np.int64)
