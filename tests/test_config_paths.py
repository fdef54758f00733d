"""Configuration-path tests: gene-corr reference, morphology mode,
BCE segmentation loss, distributed-predict CLI flag."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from segger_tpu.compat.anndata_lite import AnnDataLite
from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
from segger_tpu.data.partition import make_fit_tiles


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_cells=60, n_genes=20, mean_tx_per_cell=15,
                          seed=7)


def _base_cfg(**kw):
    defaults = dict(
        cells_embedding_size=8, genes_min_counts=6, cells_min_counts=3,
        tiling_nodes_per_tile=1000, prediction_graph_mode="uniform",
    )
    defaults.update(kw)
    return PipelineConfig(**defaults)


def test_gene_corr_reference(synth, tmp_path):
    """External scRNA reference drives the gene-gene correlation
    embedding; genes missing from it are removed under
    gene_missing_strategy='remove'."""
    rng = np.random.default_rng(0)
    genes = [f"GENE_{g:03d}" for g in range(18)]  # 18 of the 20
    X = sp.csr_matrix(rng.poisson(3, (50, 18)).astype(np.float64))
    ref = AnnDataLite(
        X,
        obs=pd.DataFrame(index=[f"rc{i}" for i in range(50)]),
        var=pd.DataFrame(index=genes),
    )
    ref_path = tmp_path / "ref.h5ad"
    ref.write_h5ad(ref_path)

    cfg = _base_cfg(
        gene_corr_reference_path=ref_path,
        gene_missing_strategy="remove",
    )
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    p.load()
    # all surviving genes exist in the reference panel
    assert set(p.adata.var.index) <= set(genes)
    assert p.graph.gene_embedding.shape[0] == p.adata.n_vars


def test_gene_corr_reference_error_strategy(synth, tmp_path):
    rng = np.random.default_rng(0)
    genes = [f"GENE_{g:03d}" for g in range(5)]
    ref = AnnDataLite(
        sp.csr_matrix(rng.poisson(3, (30, 5)).astype(np.float64)),
        obs=pd.DataFrame(index=[f"rc{i}" for i in range(30)]),
        var=pd.DataFrame(index=genes),
    )
    ref_path = tmp_path / "ref.h5ad"
    ref.write_h5ad(ref_path)
    cfg = _base_cfg(
        gene_corr_reference_path=ref_path, gene_missing_strategy="error"
    )
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    with pytest.raises(ValueError, match="not in the"):
        p.load()


def test_morphology_representation_mode(synth):
    cfg = _base_cfg(cells_representation_mode="morphology")
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    p.load()
    assert "X_morphology" in p.adata.obsm
    # bd features are the 4 shape props
    assert p.graph.bd_x.shape[1] == 4
    tr = SeggerTrainer(
        p.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=1, seed=0),
    )
    h = tr.fit(make_fit_tiles(p.graph, p.tree, margin=5.0),
               max_epochs=1)
    assert np.isfinite(h[0]["train:loss"])


def test_bce_segmentation_loss(synth):
    cfg = _base_cfg()
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    p.load()
    tr = SeggerTrainer(
        p.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=1, sg_loss_type="bce", seed=0),
    )
    h = tr.fit(make_fit_tiles(p.graph, p.tree, margin=5.0),
               max_epochs=1)
    assert np.isfinite(h[0]["train:loss_sg"])
    assert h[0]["train:loss_sg"] > 0


def test_training_is_seed_deterministic(synth):
    """Same seed -> bit-identical loss trajectory (the deterministic
    data pipeline + jax.random discipline the checkpoint/resume story
    relies on, SURVEY §5.4)."""
    cfg = _base_cfg()
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    p.load()
    tiles = make_fit_tiles(p.graph, p.tree, margin=5.0)
    tc = TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                     n_heads=1, max_epochs=2, seed=3)
    h1 = SeggerTrainer(p.graph, tc).fit(tiles, max_epochs=2)
    h2 = SeggerTrainer(p.graph, tc).fit(tiles, max_epochs=2)
    assert [r["train:loss"] for r in h1] == [r["train:loss"] for r in h2]


def test_bf16_training(synth):
    cfg = _base_cfg()
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    p.load()
    tr = SeggerTrainer(
        p.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=1, compute_dtype="bfloat16",
                    seed=0),
    )
    h = tr.fit(make_fit_tiles(p.graph, p.tree, margin=5.0),
               max_epochs=1)
    assert np.isfinite(h[0]["train:loss"])


def test_gene_corr_reference_fill_strategy(synth, tmp_path):
    """'fill' keeps every data gene: missing genes get zero-count
    columns appended to the reference (beyond-reference: the reference
    leaves this branch NotImplementedError, anndata.py:228)."""
    rng = np.random.default_rng(0)
    genes = [f"GENE_{g:03d}" for g in range(18)]  # 18 of the 20
    ref = AnnDataLite(
        sp.csr_matrix(rng.poisson(3, (50, 18)).astype(np.float64)),
        obs=pd.DataFrame(index=[f"rc{i}" for i in range(50)]),
        var=pd.DataFrame(index=genes),
    )
    ref_path = tmp_path / "ref_fill.h5ad"
    ref.write_h5ad(ref_path)

    cfg = _base_cfg(
        gene_corr_reference_path=ref_path,
        gene_missing_strategy="fill",
    )
    p = ISTPipeline(synth.transcripts, synth.boundaries, synth.polygons,
                    cfg)
    with pytest.warns(UserWarning, match="Filling"):
        p.load()
    # NO genes were dropped for missing from the reference (only the
    # count filter applies) and embeddings exist for all of them
    kept = set(p.adata.var.index)
    assert any(g not in genes for g in kept)  # a filled gene survived
    assert p.graph.gene_embedding.shape[0] == p.adata.n_vars
    assert np.isfinite(p.graph.gene_embedding).all()
