"""Out-of-core columnar path: exact parity with the DataFrame path.

The ColumnarTranscripts representation (data/columnar.py) replaces the
pandas object columns that dominate whole-slide RSS; these tests pin
that the streaming path is a pure representation change — identical
AnnData features, identical HostGraph, identical end-to-end pipeline
outputs — and that the disk spool round-trips.
"""
import numpy as np
import pandas as pd
import pytest

from segger_tpu.data.columnar import (
    ColumnarTranscripts,
    anndata_from_columnar,
)
from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.io.fields import StandardTranscriptFields
from segger_tpu.pipeline import ISTPipeline, PipelineConfig


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_cells=90, n_genes=25, mean_tx_per_cell=18,
                          seed=11)


@pytest.fixture(scope="module")
def cfg():
    return PipelineConfig(
        cells_embedding_size=8,
        genes_min_counts=5,
        cells_min_counts=3,
        prediction_graph_mode="cell",
        prediction_graph_max_k=3,
    )


def _chunks(df, n=7):
    edges = np.linspace(0, len(df), n + 1).astype(int)
    for a, b in zip(edges[:-1], edges[1:]):
        yield df.iloc[a:b]


def test_from_chunks_roundtrip(synth):
    f = StandardTranscriptFields()
    df = synth.transcripts
    cols = ColumnarTranscripts.from_chunks(_chunks(df), f)
    assert cols.n == len(df)
    np.testing.assert_allclose(cols.x, df[f.x].to_numpy(np.float32))
    np.testing.assert_allclose(cols.y, df[f.y].to_numpy(np.float32))
    np.testing.assert_array_equal(
        cols.gene_names[cols.gene_code], df[f.feature].to_numpy().astype(str)
    )
    # cell codes: -1 exactly where the vendor column is empty/NaN
    raw = df[f.cell_id]
    unassigned = raw.isna().to_numpy() | (raw.to_numpy().astype(str) == "")
    np.testing.assert_array_equal(cols.cell_code < 0, unassigned)
    got = np.where(
        cols.cell_code >= 0,
        cols.cell_ids[np.maximum(cols.cell_code, 0)], "",
    )
    np.testing.assert_array_equal(
        got[~unassigned], raw.to_numpy().astype(str)[~unassigned]
    )
    np.testing.assert_array_equal(
        cols.compartment, df[f.compartment].to_numpy(np.int8)
    )


def test_spool_roundtrip(synth, tmp_path):
    f = StandardTranscriptFields()
    df = synth.transcripts
    ram = ColumnarTranscripts.from_chunks(_chunks(df), f)
    spooled = ColumnarTranscripts.from_chunks(
        _chunks(df), f, spool=tmp_path / "spool"
    )
    assert isinstance(spooled.x, np.memmap)
    for name in ("x", "y", "gene_code", "cell_code", "compartment",
                 "row_index"):
        np.testing.assert_array_equal(
            np.asarray(getattr(spooled, name)), getattr(ram, name),
            err_msg=name,
        )
    np.testing.assert_array_equal(spooled.gene_names, ram.gene_names)
    np.testing.assert_array_equal(spooled.cell_ids, ram.cell_ids)
    # reopen fresh
    again = ColumnarTranscripts.open_spool(tmp_path / "spool")
    np.testing.assert_array_equal(np.asarray(again.gene_code),
                                  ram.gene_code)


def test_anndata_from_columnar_matches_dataframe(synth):
    from segger_tpu.data.features import anndata_from_transcripts

    f = StandardTranscriptFields()
    df = synth.transcripts
    # the DataFrame path as the pipeline invokes it: masked subset
    rng = np.random.default_rng(0)
    mask = rng.uniform(size=len(df)) < 0.8
    sub = df[mask & df[f.cell_id].notna().to_numpy()
             & (df[f.cell_id].to_numpy().astype(str) != "")]
    want = anndata_from_transcripts(
        sub, f.feature, f.cell_id, coordinate_columns=[f.x, f.y]
    )

    cols = ColumnarTranscripts.from_chunks(_chunks(df), f)
    got = anndata_from_columnar(cols, mask=mask, chunk=1000)

    np.testing.assert_array_equal(
        got.obs.index.to_numpy().astype(str), want.obs.index.to_numpy().astype(str)
    )
    np.testing.assert_array_equal(
        got.var.index.to_numpy().astype(str), want.var.index.to_numpy().astype(str)
    )
    np.testing.assert_array_equal(
        got.X.toarray(), want.X.toarray()
    )
    np.testing.assert_allclose(
        got.obsm["X_spatial"], want.obsm["X_spatial"], rtol=1e-6
    )


def test_pipeline_columnar_matches_dataframe(synth, cfg):
    f = StandardTranscriptFields()
    p_df = ISTPipeline(synth.transcripts, synth.boundaries,
                       synth.polygons, cfg).load()
    cols = ColumnarTranscripts.from_chunks(_chunks(synth.transcripts), f)
    p_col = ISTPipeline(cols, synth.boundaries, synth.polygons,
                        cfg).load()

    a, b = p_df.graph, p_col.graph
    for name in ("tx_gene", "tx_cluster", "tx_index", "tx_cell_encoding",
                 "bd_cluster", "bd_index", "bd_cell_id",
                 "tt_src", "tt_dst", "sg_src", "sg_dst",
                 "cand_src", "cand_dst"):
        np.testing.assert_array_equal(
            getattr(a, name), getattr(b, name), err_msg=name
        )
    for name in ("tx_pos", "bd_x", "bd_pos", "gene_embedding",
                 "tx_similarity", "bd_similarity"):
        np.testing.assert_allclose(
            getattr(a, name), getattr(b, name), rtol=1e-6, atol=1e-7,
            err_msg=name,
        )


def test_graph_plane_roundtrip_and_transient_tiles(synth, tmp_path):
    """save_host_graph_plane -> load_host_graph_plane(mmap=True) is
    lossless, pre-seeds the tile edge-group index, and extracts tiles
    identical to the in-RAM graph under transient (no-spec-cache)
    mode."""
    from dataclasses import fields as _fields

    import jax

    from segger_tpu.data.assemble import (
        HostGraph, load_host_graph_plane, save_host_graph_plane,
    )
    from segger_tpu.data.partition import (
        build_tiling, extract_tile, make_fit_tiles, merge_buckets,
        tile_bucket,
    )

    p = ISTPipeline(
        synth.transcripts, synth.boundaries, synth.polygons,
        PipelineConfig(
            cells_embedding_size=16, genes_min_counts=5,
            cells_min_counts=3, tiling_nodes_per_tile=600,
        ),
    )
    p.load()
    g = p.graph

    d = tmp_path / "plane"
    save_host_graph_plane(g, d)
    gm = load_host_graph_plane(d, mmap=True)
    assert gm.__dict__.get("_transient_tile_edges") is True
    assert "_edge_groups_cache" in gm.__dict__
    for f in _fields(HostGraph):
        np.testing.assert_array_equal(
            np.asarray(getattr(gm, f.name)),
            np.asarray(getattr(g, f.name)),
            err_msg=f.name,
        )

    # tiles extracted off the memmapped plane == in-RAM tiles
    tree = build_tiling(g, nodes_per_tile=600)
    tree_m = build_tiling(gm, nodes_per_tile=600)
    specs = make_fit_tiles(g, tree, margin=5.0)
    specs_m = make_fit_tiles(gm, tree_m, margin=5.0)
    assert len(specs) == len(specs_m) >= 2
    bucket = merge_buckets([tile_bucket(g, s) for s in specs])
    bucket_m = merge_buckets([tile_bucket(gm, s) for s in specs_m])
    assert bucket == bucket_m
    for s, sm in zip(specs, specs_m):
        # transient mode: nothing cached on the memmapped graph's specs
        assert getattr(sm, "_edges", None) is None
        ta = extract_tile(g, s, bucket)
        tb = extract_tile(gm, sm, bucket_m)
        for la, lb in zip(jax.tree.leaves(ta), jax.tree.leaves(tb)):
            np.testing.assert_array_equal(
                np.asarray(la), np.asarray(lb)
            )
        assert getattr(sm, "_edges", None) is None
