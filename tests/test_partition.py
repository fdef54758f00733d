"""Tiling/partition/bin-packing tests (reference semantics from
partition/dataset.py and sampler.py)."""
import numpy as np
import pytest

from segger_tpu.geometry.quadtree import QuadTree
from segger_tpu.data.partition import (
    best_fit_decreasing,
    first_fit_decreasing_bucketed,
    harmonic_k,
)


def test_quadtree_exactly_once(rng):
    pts = rng.uniform(0, 100, (5000, 2))
    tree = QuadTree.build(pts, max_leaf_size=500)
    assert tree.n_leaves > 1
    assert tree.is_exactly_once(pts)
    labels = tree.label(pts)
    assert (labels >= 0).all()
    # leaf counts match label counts
    counts = np.bincount(labels, minlength=tree.n_leaves)
    np.testing.assert_array_equal(counts, tree.leaf_counts)


def test_quadtree_max_coordinate_point_included(rng):
    """The max-coordinate corner point must land in a leaf (half-open
    boxes expanded at the top edge)."""
    pts = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    tree = QuadTree.build(pts, max_leaf_size=2)
    assert (tree.label(pts) >= 0).all()


def test_quadtree_label_unseen_points(rng):
    pts = rng.uniform(0, 100, (1000, 2))
    tree = QuadTree.build(pts, max_leaf_size=100)
    outside = np.array([[200.0, 200.0], [-5.0, 50.0]])
    assert (tree.label(outside) == -1).all()


def test_shrunk_mask_is_interior(rng):
    pts = rng.uniform(0, 100, (2000, 2))
    tree = QuadTree.build(pts, max_leaf_size=600)
    labels = tree.label(pts)
    mask = tree.shrunk_mask(pts, labels, margin=5.0)
    # every interior point is at distance >= margin from its leaf border
    for li, (x0, y0, x1, y1) in enumerate(tree.leaf_bounds):
        sel = (labels == li) & mask
        if sel.any():
            p = pts[sel]
            assert (p[:, 0] >= x0 + 5.0).all() and (p[:, 0] < x1 - 5.0).all()
            assert (p[:, 1] >= y0 + 5.0).all() and (p[:, 1] < y1 - 5.0).all()


def test_expanded_halo_covers_interior(rng):
    pts = rng.uniform(0, 100, (2000, 2))
    tree = QuadTree.build(pts, max_leaf_size=600)
    labels = tree.label(pts)
    p_idx, l_idx = tree.expanded_label_multi(pts, margin=10.0)
    # every (point, own-leaf) pair is present in the halo membership
    own = set(zip(range(len(pts)), labels.tolist()))
    halo = set(zip(p_idx.tolist(), l_idx.tolist()))
    assert own <= halo


@pytest.mark.parametrize(
    "packer", [best_fit_decreasing, first_fit_decreasing_bucketed,
               harmonic_k]
)
def test_bin_packers_respect_budget(rng, packer):
    values = rng.integers(1, 500, 100)
    budget = 1000
    kwargs = (
        {"rng": np.random.default_rng(0)}
        if packer is first_fit_decreasing_bucketed
        else {}
    )
    bins = packer(values, budget, **kwargs)
    # every item appears exactly once
    all_items = np.sort(np.concatenate(bins))
    np.testing.assert_array_equal(all_items, np.arange(100))
    # bins respect the budget (single oversized items get their own bin)
    for b in bins:
        if len(b) > 1:
            assert values[b].sum() <= budget


def test_bfd_is_deterministic(rng):
    values = rng.integers(1, 300, 50)
    a = best_fit_decreasing(values, 500)
    b = best_fit_decreasing(values, 500)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_harmonic_k_reference_semantics(rng):
    """Faithful harmonic-k contract (reference sampler.py:85-183):
    large items (> max/k) pack j-per-bin by harmonic class in arrival
    order; small items (<= max/k) pack first-fit against remaining
    capacity; invalid sizes raise unless skip_too_big."""
    # class-2 items (max/3 < v <= max/2) pack exactly 2 per bin
    vals = np.array([40.0, 45.0, 41.0, 42.0, 49.0])
    bins = harmonic_k(vals, 100.0)
    two = [sorted(b.tolist()) for b in bins if len(b) == 2]
    assert [0, 1] in two and [2, 3] in two
    assert any(b.tolist() == [4] for b in bins)

    # small items first-fit: 10+10+... fills one bin up to capacity
    small = np.full(25, 10.0)
    bins = harmonic_k(small, 100.0, k=6)
    sizes = sorted(len(b) for b in bins)
    assert sizes == [5, 10, 10]

    # validation
    with pytest.raises(ValueError):
        harmonic_k(np.array([5.0, 200.0]), 100.0)
    bins = harmonic_k(np.array([5.0, 200.0, -1.0, 30.0]), 100.0,
                      skip_too_big=True)
    packed = np.concatenate(bins)
    assert set(packed.tolist()) == {0, 3}
    with pytest.raises(ValueError):
        harmonic_k(np.array([5.0]), 100.0, k=1)


def test_edge_groups_matches_naive_subselect(rng):
    """The O(E_tile) edge-index path must select exactly the same edge
    set (as a multiset of (src, dst) local pairs) as the naive
    O(E_graph) scan it replaced."""
    from segger_tpu.data.partition import (
        _EdgeGroups, _subselect_edges,
    )

    n = 500
    e = 4000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rows_in = np.sort(rng.choice(n, 120, replace=False))
    node_map = np.full(n, -1, np.int64)
    node_map[rows_in] = np.arange(rows_in.size)

    want_s, want_d = _subselect_edges(src, dst, node_map)

    eg = _EdgeGroups(dst, n)
    r = eg.rows(rows_in)
    s = node_map[src[r]]
    d = node_map[dst[r]]
    keep = (s >= 0) & (d >= 0)
    got = set(zip(s[keep].tolist(), d[keep].tolist()))
    want = set(zip(want_s.tolist(), want_d.tolist()))
    assert got == want
    # multiset sizes agree too (duplicates preserved)
    assert keep.sum() == want_s.size


def test_tile_edges_cached_on_spec(rng):
    """_tile_edges caches per spec and equals the naive selection."""
    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.data.partition import (
        make_fit_tiles, build_tiling, _tile_edges, _subselect_edges,
    )

    s = make_synthetic(n_cells=80, n_genes=20, mean_tx_per_cell=12,
                       seed=9)
    cfg = PipelineConfig(
        cells_embedding_size=8, genes_min_counts=5, cells_min_counts=3,
        prediction_graph_mode="uniform",
    )
    p = ISTPipeline(s.transcripts, s.boundaries, s.polygons, cfg).load()
    g = p.graph
    tiles = make_fit_tiles(g, build_tiling(g, nodes_per_tile=400),
                           margin=5.0)
    spec = tiles[0]
    tt_s, tt_d, *_ = _tile_edges(g, spec)
    assert getattr(spec, "_edges", None) is not None
    # same object back on the second call (cache hit)
    assert _tile_edges(g, spec)[0] is tt_s

    tx_map = np.full(g.n_tx, -1, np.int64)
    tx_map[spec.tx_rows] = np.arange(spec.tx_rows.size)
    want_s, want_d = _subselect_edges(g.tt_src, g.tt_dst, tx_map)
    assert set(zip(tt_s.tolist(), tt_d.tolist())) == set(
        zip(want_s.tolist(), want_d.tolist())
    )
