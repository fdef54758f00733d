"""Native C++ spatial core tests: parity with the NumPy/SciPy paths."""
import numpy as np
import pytest

from segger_tpu import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native core failed to build"
)


@requires_native
def test_grid_knn_matches_kdtree(rng):
    from scipy.spatial import KDTree

    pts = rng.uniform(0, 100, (3000, 2))
    k, r = 5, 5.0
    got = native.grid_knn(pts, max_k=k, max_dist=r)

    tree = KDTree(pts)
    d, want = tree.query(pts, k=k, distance_upper_bound=r)
    want = np.where(want < len(pts), want, -1)
    # sets of neighbors must match per query (order ties can differ)
    for i in range(0, 3000, 97):
        assert set(got[i][got[i] >= 0]) == set(want[i][want[i] >= 0])


@requires_native
def test_grid_knn_query_points(rng):
    pts = rng.uniform(0, 50, (500, 2))
    q = rng.uniform(0, 50, (40, 2))
    idx, dist = native.grid_knn(
        pts, max_k=3, max_dist=np.inf, query=q, return_dist=True
    )
    # brute-force check
    for i in range(40):
        d2 = ((pts - q[i]) ** 2).sum(1)
        want = np.argsort(d2)[:3]
        np.testing.assert_array_equal(np.sort(idx[i]), np.sort(want))
        np.testing.assert_allclose(
            np.sort(dist[i]), np.sort(np.sqrt(d2[want])), rtol=1e-9
        )


@requires_native
def test_points_in_polygons_matches_numpy(rng):
    from segger_tpu.geometry.query import (
        points_in_polygon,
    )

    pts = rng.uniform(0, 60, (2000, 2))
    polys = []
    for cx, cy in rng.uniform(5, 55, (15, 2)):
        th = np.linspace(0, 2 * np.pi, 12, endpoint=False)
        r = 3 * (1 + rng.uniform(-0.3, 0.3, 12))
        polys.append(
            np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], 1)
        )
    dists = rng.uniform(0, 1.0, 15)

    p_idx, g_idx = native.points_in_polygons(pts, polys, dists)
    got = set(zip(p_idx.tolist(), g_idx.tolist()))

    want = set()
    for gi, poly in enumerate(polys):
        hit = points_in_polygon(pts, poly, dists[gi])
        for pi in np.where(hit)[0]:
            want.add((int(pi), gi))
    assert got == want


@requires_native
def test_morton_codes_locality(rng):
    pts = rng.uniform(0, 100, (1000, 2))
    codes = native.morton_codes(pts)
    order = np.argsort(codes)
    sorted_pts = pts[order]
    # consecutive Morton-ordered points should be spatially close on
    # average (vs random order)
    d_m = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    d_r = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
    assert d_m < d_r * 0.35


def test_morton_decode_roundtrip(rng):
    """encode -> decode preserves grid-cell ordering per axis."""
    pts = rng.uniform(0, 100, (500, 2))
    codes = native.morton_codes(pts)
    grid = native.morton_decode(codes)
    # decoded coordinates are monotone in the original coordinates
    for axis in range(2):
        order = np.argsort(pts[:, axis])
        g = grid[order, axis]
        # allow equal grid cells; must never decrease
        assert (np.diff(g) >= 0).all()


def test_morton_fallback_matches_native(rng):
    pts = rng.uniform(0, 10, (200, 2))
    import segger_tpu.native as nat

    fallback = None
    # force fallback by computing with the pure-NumPy branch
    lib = nat._LIB
    try:
        nat._LIB = None
        nat._TRIED = True
        fallback = nat.morton_codes(pts)
    finally:
        nat._LIB = lib
        nat._TRIED = lib is not None
    if nat.available():
        native_codes = nat.morton_codes(pts)
        np.testing.assert_array_equal(fallback, native_codes)
