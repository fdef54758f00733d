"""End-to-end pipeline test on synthetic data (BASELINE config #1:
~5k transcripts + 200 nuclei, full pipeline on the CPU mesh)."""
import numpy as np
import pandas as pd
import pytest

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.train.trainer import TrainConfig


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_cells=200, n_genes=40, mean_tx_per_cell=25,
                          seed=0)


@pytest.fixture(scope="module")
def pipeline(synth):
    cfg = PipelineConfig(
        cells_embedding_size=16,
        genes_min_counts=10,
        cells_min_counts=5,
        tiling_nodes_per_tile=2000,
        tiling_margin_training=10.0,
        tiling_margin_prediction=15.0,
        prediction_graph_mode="cell",
        prediction_graph_buffer_ratio=0.2,
    )
    p = ISTPipeline(
        synth.transcripts, synth.boundaries, synth.polygons, cfg
    )
    p.load()
    return p


def test_graph_construction(pipeline, synth):
    g = pipeline.graph
    assert g.n_tx > 4000
    assert g.n_bd == 200
    assert g.tt_src.size > 0 and g.sg_src.size > 0 and g.cand_src.size > 0
    # supervision edges only for nuclear transcripts with known cells
    assert (g.tx_cell_encoding[g.sg_src] == g.sg_dst).all()
    # every candidate edge is a valid (tx, bd) pair
    assert g.cand_dst.max() < g.n_bd and g.cand_src.max() < g.n_tx


def test_tiling_exactly_once(pipeline):
    g, tree = pipeline.graph, pipeline.tree
    assert tree.is_exactly_once(g.tx_pos)
    labels = tree.label(g.tx_pos)
    assert (labels >= 0).all()


def test_e2e_train_predict_write(pipeline, synth, tmp_path_factory):
    out = tmp_path_factory.mktemp("segger_out")
    seg = pipeline.run(
        out,
        train_config=TrainConfig(
            hidden_channels=32,
            out_channels=32,
            n_mid_layers=1,
            n_heads=2,
            max_epochs=8,
            edges_per_batch=100_000,
            seed=0,
        ),
    )
    assert (out / "segger_segmentation.parquet").exists()
    assert (out / "segger_anndata.h5ad").exists()

    # every interior transcript predicted exactly once
    assert seg["row_index"].is_unique
    assert len(seg) > 4000

    # accuracy vs ground truth on transcripts that truly belong to a cell
    tx = synth.transcripts
    truth = pd.Series(synth.truth_cell, index=tx["row_index"].to_numpy())
    merged = seg.set_index("row_index")
    common = merged.index.intersection(truth.index[truth != ""])
    pred = merged.loc[common, "segger_cell_id"]
    acc = (pred == truth.loc[common]).mean()
    # the assignment is essentially nearest-embedding matching of
    # candidates; on well-separated synthetic cells this should be high
    assert acc > 0.6, f"assignment accuracy too low: {acc:.3f}"

    # h5ad output is readable
    from segger_tpu.compat.anndata_lite import read_h5ad

    ad = read_h5ad(out / "segger_anndata.h5ad")
    assert ad.n_obs > 50
    assert "X_spatial" in ad.obsm
