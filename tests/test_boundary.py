"""Boundary export: Delaunay-pruned concave outlines (export/boundary.py).

Covers the array-first EdgeTable engine against the reference's
behavioral contract (src/segger/export/boundary.py:157-217): concave
ring around the points, never-orphan pruning invariant, convex-hull and
smoothing options, degenerate handling, and serial/parallel equality.
"""
import numpy as np
import pandas as pd
import pytest

from segger_tpu.export.boundary import (
    EdgeTable,
    _ring_area,
    cell_boundary,
    chaikin,
    generate_boundaries,
)


def _blob(rng, n=200, r=3.0):
    th = rng.uniform(0, 2 * np.pi, n)
    rad = r * np.sqrt(rng.uniform(0, 1, n))
    return np.c_[rad * np.cos(th), rad * np.sin(th)]


def _points_in_ring(ring, pts):
    """Even-odd rule point-in-polygon, vectorized."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), bool)
    n = len(ring)
    j = n - 1
    for i in range(n):
        xi, yi = ring[i]
        xj, yj = ring[j]
        hit = ((yi > y) != (yj > y)) & (
            x < (xj - xi) * (y - yi) / (yj - yi + 1e-300) + xi
        )
        inside ^= hit
        j = i
    return inside


def test_delaunay_outline_encloses_most_points(rng):
    pts = _blob(rng)
    ring = cell_boundary(pts, method="delaunay")
    assert ring is not None and ring.shape[1] == 2
    # the outline is concave but should still contain the bulk of the
    # cloud (boundary points sit *on* the ring and may test either way)
    frac = _points_in_ring(ring, pts).mean()
    assert frac > 0.7
    assert _ring_area(ring) > 0


def test_convex_hull_contains_all(rng):
    pts = _blob(rng, n=80)
    ring = cell_boundary(pts, method="convex_hull")
    interior = pts[~np.isin(np.arange(len(pts)),
                            np.array([], dtype=int))]
    # hull area >= delaunay outline area
    concave = cell_boundary(pts, method="delaunay")
    assert _ring_area(ring) >= _ring_area(concave) - 1e-9


def test_degenerate_inputs():
    assert cell_boundary(np.zeros((2, 2))) is None
    assert cell_boundary(np.tile([[1.0, 2.0]], (10, 1))) is None
    line = np.c_[np.linspace(0, 1, 10), np.zeros(10)]
    assert cell_boundary(line) is None
    assert cell_boundary(np.zeros((2, 2)), method="convex_hull") is None
    with pytest.raises(ValueError):
        cell_boundary(np.zeros((5, 2)), method="bogus")


def test_never_orphans_a_vertex(rng):
    """The reference's degree guard: pruning never leaves a point with
    zero incident edges (boundary.py:92-97)."""
    for _ in range(10):
        pts = _blob(rng, n=rng.integers(10, 120))
        et = EdgeTable(pts).prune(connectivity=1.0)
        deg = np.bincount(
            et.verts[et.alive].ravel(), minlength=len(et.points)
        )
        assert (deg >= 1).all()


def test_prune_drops_long_bridge(rng):
    """Two dense clusters joined by a thin bridge of long Delaunay
    edges: the outline should retain only the bigger cluster's ring."""
    a = _blob(rng, n=150, r=2.0)
    b = _blob(rng, n=40, r=1.0) + np.array([40.0, 0.0])
    pts = np.vstack([a, b])
    ring = cell_boundary(pts, connectivity=1.0)
    assert ring is not None
    # ring stays on one side of the gap
    assert (ring[:, 0] < 20).all() or (ring[:, 0] > 20).all()


def test_chaikin_doubles_and_shrinks():
    sq = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    s1 = chaikin(sq, 1)
    assert s1.shape == (8, 2)
    # corner cutting keeps the ring inside the original square
    assert (s1 >= -1e-9).all() and (s1 <= 1 + 1e-9).all()
    s3 = chaikin(sq, 3)
    assert s3.shape == (32, 2)
    assert _ring_area(s3) < 1.0


def test_smoothing_applied(rng):
    pts = _blob(rng, n=100)
    raw = cell_boundary(pts, smoothing=0)
    sm = cell_boundary(pts, smoothing=2)
    assert len(sm) == 4 * len(raw)


def test_generate_boundaries_table(rng):
    n_cells = 30
    centers = rng.uniform(0, 200, (n_cells, 2))
    counts = rng.integers(5, 60, n_cells)
    pts = np.repeat(centers, counts, axis=0) + rng.normal(
        0, 2, (counts.sum(), 2)
    )
    df = pd.DataFrame({
        "cell_id": np.repeat(np.arange(n_cells), counts),
        "x": pts[:, 0], "y": pts[:, 1],
    })
    out = generate_boundaries(df, workers=0)
    assert set(out.columns) == {"cell_id", "n_transcripts", "polygon"}
    assert out.index.name == "cell_id"
    assert 0 < len(out) <= n_cells
    # n_transcripts matches the input group sizes
    for cid, row in out.iterrows():
        assert row["n_transcripts"] == counts[int(cid)]


def test_generate_boundaries_parallel_matches_serial(rng):
    n_cells = 50
    centers = rng.uniform(0, 300, (n_cells, 2))
    counts = rng.integers(5, 80, n_cells)
    pts = np.repeat(centers, counts, axis=0) + rng.normal(
        0, 2, (counts.sum(), 2)
    )
    df = pd.DataFrame({
        "cell_id": np.repeat(np.arange(n_cells), counts),
        "x": pts[:, 0], "y": pts[:, 1],
    })
    serial = generate_boundaries(df, workers=0)
    par = generate_boundaries(df, workers=2)
    assert list(serial.index) == list(par.index)
    for a, b in zip(serial["polygon"], par["polygon"]):
        np.testing.assert_allclose(a, b)


def test_edge_table_structure(rng):
    """tri0/tri1 bookkeeping: hull edges have one incident triangle,
    interior edges two; angle columns are valid interior angles."""
    pts = _blob(rng, n=60)
    et = EdgeTable(pts)
    ntri = (et.tri0 >= 0).astype(int) + (et.tri1 >= 0).astype(int)
    assert set(np.unique(ntri)) <= {1, 2}
    live0 = et.tri0 >= 0
    assert (et.ang0[live0] > 0).all()
    assert (et.ang0[live0] < 180).all()
    # Euler-ish sanity: E < 3V
    assert et.verts.shape[0] < 3 * len(pts)
    # d_max equals the max nearest-neighbor distance (KDTree check)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(pts).query(pts, k=2)
    assert np.isclose(et.d_max, d[:, 1].max())


def test_duplicate_coordinates_keep_d_max_finite(rng):
    """Pixel-quantized data routinely contains coincident transcripts;
    scipy's Delaunay drops duplicates from every simplex, which must not
    blow d_max to inf (that would disable all length-based pruning)."""
    pts = _blob(rng, n=50)
    dup = np.concatenate([pts, pts[:3]])  # 3 coincident duplicates
    et = EdgeTable(dup)
    assert np.isfinite(et.d_max) and et.d_max > 0
    # same outline as the deduplicated cloud
    ring_dup = cell_boundary(dup, method="delaunay")
    ring = cell_boundary(pts, method="delaunay")
    assert ring_dup is not None and ring is not None
    assert abs(_ring_area(ring_dup) - _ring_area(ring)) < 1e-9
