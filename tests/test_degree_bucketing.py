"""Degree-bucketed edge stage: split kernels + tile reordering.

The fused edge stage halves its gather/padding traffic by running a
narrow kernel over destination rows with small in-degree
(data/partition.py::apply_degree_bucketing).  These tests pin:

  - op level: narrow+wide split == single full-width call (fwd + grads)
  - tile level: apply_degree_bucketing preserves graph semantics (model
    outputs equal up to the row permutation), packing invariant, and
    sub-table/transpose consistency
  - pipeline level: extract_tile + merged buckets produce stackable,
    invariant-respecting tiles
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.ops import PaddedCSR, coo_to_padded_csr, transpose_csr
from segger_tpu.ops.padded_csr import padded_csr_to_coo
from segger_tpu.ops.pallas import postgather


def _skewed_csr(rng, n_src=700, n_dst=600, n_lo_rows=480):
    """COO with low in-degree on the leading rows, high on the tail."""
    degs = np.concatenate([
        rng.integers(0, 7, n_lo_rows),
        rng.integers(9, 15, n_dst - n_lo_rows),
    ])
    dst = np.repeat(np.arange(n_dst), degs)
    src = rng.integers(0, n_src, dst.size)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst, pad_to_multiple=8)
    return csr, n_src


def test_split_edge_stage_matches_full(rng):
    csr, n_src = _skewed_csr(rng)
    n_dst, k = csr.idx.shape
    assert k > 8
    n_lo, k_lo = 480, 8
    heads, ch = 2, 64
    hc = heads * ch

    csr_t = transpose_csr(csr, n_src=n_src)
    csr_lo = PaddedCSR(idx=csr.idx[:n_lo, :k_lo],
                       mask=csr.mask[:n_lo, :k_lo])
    csr_hi = PaddedCSR(idx=csr.idx[n_lo:], mask=csr.mask[n_lo:])
    lo_t = transpose_csr(csr_lo, n_src=n_src)
    hi_t = transpose_csr(csr_hi, n_src=n_src)
    to_dev = lambda c: jax.tree.map(jnp.asarray, c)
    csr, csr_t, csr_lo, csr_hi, lo_t, hi_t = map(
        to_dev, (csr, csr_t, csr_lo, csr_hi, lo_t, hi_t)
    )

    xl = jnp.asarray(rng.normal(size=(n_src, hc)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(n_dst, hc)), jnp.float32)
    att = jnp.asarray(rng.normal(size=(heads, ch)), jnp.float32)
    keep = postgather.no_dropout_keep(heads)
    cfg = (heads, 0.2, True)
    cot = jnp.asarray(rng.normal(size=(n_dst, hc)), jnp.float32)

    def full(xl, xr, att):
        return postgather.gatv2_edge_stage_pallas(
            xl, xr, att, keep, csr, csr_t, cfg)

    def split(xl, xr, att):
        lo = postgather.gatv2_edge_stage_pallas(
            xl, xr[:n_lo], att, keep, csr_lo, lo_t, cfg)
        hi = postgather.gatv2_edge_stage_pallas(
            xl, xr[n_lo:], att, keep, csr_hi, hi_t, cfg)
        return jnp.concatenate([lo, hi], axis=0)

    np.testing.assert_allclose(
        split(xl, xr, att), full(xl, xr, att), atol=2e-5
    )

    def g(fn):
        return jax.grad(
            lambda *a: (fn(*a) * cot).sum(), argnums=(0, 1, 2)
        )(xl, xr, att)

    for name, a, b in zip(("dxl", "dxr", "datt"), g(full), g(split)):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-5,
            err_msg=name,
        )


def _bench_like_tile(rng, n_tx=3000, n_bd=150, n_genes=40):
    from segger_tpu.data.graph import TileGraph
    from segger_tpu.data.neighbors_host import kdtree_neighbors
    from segger_tpu.data.partition import _sampler_structure

    # extent scales with sqrt(n_tx): constant density, so the degree
    # distribution (and the xlo/lo/hi class mix) matches the 3000-node
    # default at any size
    ext = 150.0 * float(np.sqrt(n_tx / 3000))
    pos = rng.uniform(0, ext, (n_tx, 2)).astype(np.float32)
    src, dst = kdtree_neighbors(pos, max_k=5, max_dist=5.0)
    bd_pos = rng.uniform(0, ext, (n_bd, 2)).astype(np.float32)
    bd_of = rng.integers(0, n_bd, n_tx)
    sg_sel = rng.uniform(size=n_tx) < 0.3
    sg_src = np.where(sg_sel)[0]
    sg_dst = bd_of[sg_sel]
    cand_src = np.repeat(np.arange(n_tx), 2)
    cand_dst = rng.integers(0, n_bd, cand_src.size)
    tt = coo_to_padded_csr(dst, src, n_dst=n_tx, pad_to_multiple=8)
    tb = coo_to_padded_csr(sg_dst, sg_src, n_dst=n_bd, pad_to_multiple=8)
    tile = TileGraph(
        tx_gene=rng.integers(0, n_genes, n_tx).astype(np.int32),
        tx_pos=pos,
        tx_cluster=rng.integers(0, 8, n_tx).astype(np.int32),
        tx_index=np.arange(n_tx, dtype=np.int32),
        tx_valid=np.ones(n_tx, bool),
        tx_interior=rng.uniform(size=n_tx) < 0.8,
        bd_x=rng.normal(size=(n_bd, 32)).astype(np.float32),
        bd_pos=bd_pos,
        bd_cluster=rng.integers(0, 5, n_bd).astype(np.int32),
        bd_index=np.arange(n_bd, dtype=np.int32),
        bd_valid=np.ones(n_bd, bool),
        bd_interior=np.ones(n_bd, bool),
        tt=tt,
        tb=tb,
        cand=coo_to_padded_csr(cand_src, cand_dst, n_dst=n_tx, k=2),
        sg_src=sg_src.astype(np.int32),
        sg_dst=sg_dst.astype(np.int32),
        sg_mask=np.ones(sg_src.size, bool),
        tt_t=transpose_csr(tt, n_src=n_tx),
        tb_t=transpose_csr(tb, n_src=n_tx),
    )
    tx_ss, tx_sc = _sampler_structure(
        tile.tx_cluster, tile.tx_interior, n_tx, n_tx, 8
    )
    return tile.replace(tx_sampler_sorted=tx_ss, tx_sampler_counts=tx_sc)


def test_apply_degree_bucketing_invariants(rng):
    from segger_tpu.data.partition import (
        apply_degree_bucketing, DEGREE_BUCKET_K_LO,
    )

    tile = _bench_like_tile(rng)
    k_lo = DEGREE_BUCKET_K_LO
    if tile.tt.idx.shape[1] <= k_lo:
        pytest.skip("graph too sparse to split")
    deg = tile.tt.mask.sum(1)
    n_lo = int((deg <= k_lo).sum()) // 8 * 8
    out = apply_degree_bucketing(tile, n_lo=n_lo)

    # lo region really is low-degree; packing invariant holds
    deg2 = out.tt.mask.sum(1)
    assert (deg2[:n_lo] <= k_lo).all()
    assert out.tx_valid[: out.tx_valid.sum()].all()

    # same edge multiset under the global relabel
    def edges_global(t):
        d, s = padded_csr_to_coo(t.tt)
        gi = np.asarray(t.tx_index)
        return set(zip(gi[d].tolist(), gi[s].tolist()))

    assert edges_global(out) == edges_global(tile)

    # lo + hi sub-tables partition the edge set
    lo = PaddedCSR(idx=out.tt.idx[:n_lo, :k_lo],
                   mask=out.tt.mask[:n_lo, :k_lo])
    hi = PaddedCSR(idx=out.tt.idx[n_lo:], mask=out.tt.mask[n_lo:])
    d_lo, s_lo = padded_csr_to_coo(lo)
    d_hi, s_hi = padded_csr_to_coo(hi)
    assert d_lo.size + d_hi.size == int(tile.tt.mask.sum())

    # transpose tables route every edge slot exactly once
    for sub, sub_t in ((lo, out.tt_lo_t), (hi, out.tt_hi_t)):
        flat = np.sort(np.asarray(sub_t.idx)[np.asarray(sub_t.mask)])
        want = np.sort(np.flatnonzero(np.asarray(sub.mask).ravel()))
        np.testing.assert_array_equal(flat, want)


def test_bucketed_tile_model_parity(rng):
    """Model outputs on the bucketed tile equal the original tile's up
    to the row permutation (CPU/XLA path: exercises that the reordering
    itself is semantics-preserving end-to-end through the encoder)."""
    from segger_tpu.data.partition import apply_degree_bucketing
    from segger_tpu.models import ISTEncoder

    tile = _bench_like_tile(rng)
    deg = tile.tt.mask.sum(1)
    n_lo = int((deg <= 8).sum()) // 8 * 8
    bucketed = apply_degree_bucketing(tile, n_lo=n_lo)
    assert bucketed.tt_n_lo == n_lo

    model = ISTEncoder(
        n_genes=40, in_channels=8, hidden_channels=16, out_channels=16,
        n_mid_layers=1, n_heads=2,
    )
    tile_d = jax.tree.map(jnp.asarray, tile)
    buck_d = jax.tree.map(jnp.asarray, bucketed)
    params = model.init(jax.random.PRNGKey(0), tile_d)
    out_a = model.apply(params, tile_d)
    out_b = model.apply(params, buck_d)

    # map rows through global indices
    order_a = np.argsort(np.asarray(tile.tx_index))
    order_b = np.argsort(np.asarray(bucketed.tx_index))
    np.testing.assert_allclose(
        np.asarray(out_b["tx"])[order_b],
        np.asarray(out_a["tx"])[order_a],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_b["bd"]), np.asarray(out_a["bd"]), atol=1e-5
    )


def test_extract_tile_buckets_stack(rng):
    """Pipeline path: merged buckets with a lo boundary produce
    stackable tiles whose lo regions respect the boundary."""
    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.data.partition import (
        make_fit_tiles, tile_bucket, merge_buckets, extract_tile,
        stack_tiles,
    )
    from segger_tpu.geometry.quadtree import QuadTree
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig

    data = make_synthetic(n_cells=80, n_genes=30, mean_tx_per_cell=30,
                          seed=3)
    p = ISTPipeline(
        data.transcripts, data.boundaries, data.polygons,
        PipelineConfig(
            cells_embedding_size=16, genes_min_counts=5,
            cells_min_counts=3, tiling_nodes_per_tile=800,
            tiling_margin_training=5.0,
        ),
    )
    p.load()
    graph, tree = p.graph, p.tree
    specs = make_fit_tiles(graph, tree, margin=5.0)
    assert len(specs) >= 2
    shapes = [tile_bucket(g, s) for g, s in
              zip([graph] * len(specs), specs)]
    bucket = merge_buckets(shapes)
    tiles = [extract_tile(graph, s, bucket) for s in specs]
    if bucket.n_lo > 0:
        for t in tiles:
            assert t.tt_n_lo == bucket.n_lo
            assert (t.tt.mask[:bucket.n_lo].sum(1) <= bucket.k_lo).all()
            assert t.tt_lo_t is not None and t.tt_hi_t is not None
    stacked = stack_tiles(tiles)
    assert stacked.tx_gene.shape[0] == len(tiles)


def _skewed_csr3(rng, n_src=700, n_dst=720, n_xlo_rows=320,
                 n_lo_rows=240):
    """COO with three in-degree classes on consecutive row ranges:
    xlo (<=4), lo (5..8), hi (>8)."""
    degs = np.concatenate([
        rng.integers(0, 4, n_xlo_rows),
        rng.integers(5, 8, n_lo_rows),
        rng.integers(9, 15, n_dst - n_xlo_rows - n_lo_rows),
    ])
    dst = np.repeat(np.arange(n_dst), degs)
    src = rng.integers(0, n_src, dst.size)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst, pad_to_multiple=8)
    return csr, n_src


def test_three_way_split_edge_stage_matches_full(rng):
    """xlo(K=4) + lo(K=8) + hi(full) kernel calls == one full-width
    call, forward and grads (interpret mode)."""
    csr, n_src = _skewed_csr3(rng)
    n_dst, k = csr.idx.shape
    assert k > 8
    n_xlo, k_xlo, n_lo, k_lo = 320, 4, 560, 8
    heads, ch = 2, 64
    hc = heads * ch

    csr_t = transpose_csr(csr, n_src=n_src)
    subs = [
        PaddedCSR(idx=csr.idx[:n_xlo, :k_xlo],
                  mask=csr.mask[:n_xlo, :k_xlo]),
        PaddedCSR(idx=csr.idx[n_xlo:n_lo, :k_lo],
                  mask=csr.mask[n_xlo:n_lo, :k_lo]),
        PaddedCSR(idx=csr.idx[n_lo:], mask=csr.mask[n_lo:]),
    ]
    sub_ts = [transpose_csr(s, n_src=n_src) for s in subs]
    to_dev = lambda c: jax.tree.map(jnp.asarray, c)
    csr, csr_t = to_dev(csr), to_dev(csr_t)
    subs, sub_ts = map(to_dev, subs), map(to_dev, sub_ts)
    subs, sub_ts = list(subs), list(sub_ts)

    xl = jnp.asarray(rng.normal(size=(n_src, hc)), jnp.float32)
    xr = jnp.asarray(rng.normal(size=(n_dst, hc)), jnp.float32)
    att = jnp.asarray(rng.normal(size=(heads, ch)), jnp.float32)
    keep = postgather.no_dropout_keep(heads)
    cfg = (heads, 0.2, True)
    cot = jnp.asarray(rng.normal(size=(n_dst, hc)), jnp.float32)
    bounds = [(0, n_xlo), (n_xlo, n_lo), (n_lo, n_dst)]

    def full(xl, xr, att):
        return postgather.gatv2_edge_stage_pallas(
            xl, xr, att, keep, csr, csr_t, cfg)

    def split(xl, xr, att):
        outs = [
            postgather.gatv2_edge_stage_pallas(
                xl, xr[a:b], att, keep, s, st, cfg)
            for (a, b), s, st in zip(bounds, subs, sub_ts)
        ]
        return jnp.concatenate(outs, axis=0)

    np.testing.assert_allclose(
        split(xl, xr, att), full(xl, xr, att), atol=2e-5
    )

    def g(fn):
        return jax.grad(
            lambda *a: (fn(*a) * cot).sum(), argnums=(0, 1, 2)
        )(xl, xr, att)

    for name, a, b in zip(("dxl", "dxr", "datt"), g(full), g(split)):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=3e-5,
            err_msg=name,
        )


def test_apply_degree_bucketing_xlo_invariants(rng):
    from segger_tpu.data.partition import (
        apply_degree_bucketing, DEGREE_BUCKET_K_LO, DEGREE_BUCKET_K_XLO,
    )

    tile = _bench_like_tile(rng)
    k_lo, k_xlo = DEGREE_BUCKET_K_LO, DEGREE_BUCKET_K_XLO
    if tile.tt.idx.shape[1] <= k_lo:
        pytest.skip("graph too sparse to split")
    deg = tile.tt.mask.sum(1)
    n_lo = int((deg <= k_lo).sum()) // 8 * 8
    n_xlo = int((deg <= k_xlo).sum()) // 8 * 8
    assert n_xlo > 0, "fixture should have deg<=4 rows"
    out = apply_degree_bucketing(tile, n_lo=n_lo, n_xlo=n_xlo)
    assert out.tt_n_xlo == n_xlo and out.tt_k_xlo == k_xlo

    deg2 = out.tt.mask.sum(1)
    assert (deg2[:n_xlo] <= k_xlo).all()
    assert (deg2[:n_lo] <= k_lo).all()
    assert out.tx_valid[: out.tx_valid.sum()].all()

    # same edge multiset under the global relabel
    def edges_global(t):
        d, s = padded_csr_to_coo(t.tt)
        gi = np.asarray(t.tx_index)
        return set(zip(gi[d].tolist(), gi[s].tolist()))

    assert edges_global(out) == edges_global(tile)

    # xlo + lo + hi sub-tables partition the edge set
    xlo = PaddedCSR(idx=out.tt.idx[:n_xlo, :k_xlo],
                    mask=out.tt.mask[:n_xlo, :k_xlo])
    lo = PaddedCSR(idx=out.tt.idx[n_xlo:n_lo, :k_lo],
                   mask=out.tt.mask[n_xlo:n_lo, :k_lo])
    hi = PaddedCSR(idx=out.tt.idx[n_lo:], mask=out.tt.mask[n_lo:])
    total = sum(
        padded_csr_to_coo(s)[0].size for s in (xlo, lo, hi)
    )
    assert total == int(tile.tt.mask.sum())

    # transpose tables route every edge slot of their sub-table once
    for sub, sub_t in ((xlo, out.tt_xlo_t), (lo, out.tt_lo_t),
                       (hi, out.tt_hi_t)):
        flat = np.sort(np.asarray(sub_t.idx)[np.asarray(sub_t.mask)])
        want = np.sort(np.flatnonzero(np.asarray(sub.mask).ravel()))
        np.testing.assert_array_equal(flat, want)


def test_xlo_bucketed_encoder_parity(rng, monkeypatch):
    """Encoder on an xlo-bucketed tile (forced Pallas interpret path,
    exercising the 3-segment split wiring) equals the plain-XLA path on
    the unbucketed tile up to the row permutation."""
    from segger_tpu.data.partition import apply_degree_bucketing
    from segger_tpu.models import ISTEncoder

    tile = _bench_like_tile(rng, n_tx=800, n_bd=60)
    deg = tile.tt.mask.sum(1)
    n_lo = int((deg <= 8).sum()) // 8 * 8
    n_xlo = int((deg <= 4).sum()) // 8 * 8
    if n_xlo == 0 or tile.tt.idx.shape[1] <= 8:
        pytest.skip("fixture lacks an xlo population")
    bucketed = apply_degree_bucketing(tile, n_lo=n_lo, n_xlo=n_xlo)
    assert bucketed.tt_n_xlo == n_xlo
    assert bucketed.tt_xlo_t is not None

    model = ISTEncoder(
        n_genes=40, in_channels=8, hidden_channels=16, out_channels=16,
        n_mid_layers=0, n_heads=2,
    )
    tile_d = jax.tree.map(jnp.asarray, tile)
    buck_d = jax.tree.map(jnp.asarray, bucketed)
    params = model.init(jax.random.PRNGKey(0), tile_d)
    out_a = model.apply(params, tile_d)
    monkeypatch.setenv("SEGGER_EDGE_STAGE", "pallas")
    out_b = model.apply(params, buck_d)

    order_a = np.argsort(np.asarray(tile.tx_index))
    order_b = np.argsort(np.asarray(bucketed.tx_index))
    np.testing.assert_allclose(
        np.asarray(out_b["tx"])[order_b],
        np.asarray(out_a["tx"])[order_a],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_b["bd"]), np.asarray(out_a["bd"]), atol=2e-5
    )
