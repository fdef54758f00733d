"""Trainer extras: mesh-sharded fit, checkpoint/resume, square tiling,
polygon-polygon join, profiling utilities."""
import numpy as np
import pandas as pd
import pytest

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
from segger_tpu.data.partition import (
    make_fit_tiles,
    build_tiling,
    square_tiling,
)


@pytest.fixture(scope="module")
def small_pipeline():
    s = make_synthetic(n_cells=100, n_genes=24, mean_tx_per_cell=15,
                       seed=5)
    cfg = PipelineConfig(
        cells_embedding_size=8, genes_min_counts=8, cells_min_counts=4,
        tiling_nodes_per_tile=1500, tiling_margin_training=8.0,
        prediction_graph_mode="uniform",
    )
    return ISTPipeline(
        s.transcripts, s.boundaries, s.polygons, cfg
    ).load()


def test_mesh_sharded_fit(small_pipeline):
    """Training with the stacked-tile batch sharded over 4 devices."""
    from segger_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(4)
    tr = SeggerTrainer(
        small_pipeline.graph,
        TrainConfig(
            hidden_channels=8, out_channels=8, n_mid_layers=0,
            n_heads=1, max_epochs=1, tiles_per_step=4, seed=0,
        ),
        mesh=mesh,
    )
    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    hist = tr.fit(tiles, max_epochs=1)
    assert np.isfinite(hist[0]["train:loss"])


def test_tile_cache_identical_training(small_pipeline, monkeypatch):
    """The epoch-spanning extraction cache must not change training:
    same loss history with the cache on and off, and epochs >= 2 must
    actually hit it (extract_tile called only in epoch 1)."""
    import segger_tpu.train.trainer as trainer_mod

    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    kw = dict(hidden_channels=8, out_channels=8, n_mid_layers=0,
              n_heads=1, max_epochs=2, seed=0)

    calls = {"n": 0}
    real = trainer_mod.extract_tile

    def counted(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(trainer_mod, "extract_tile", counted)

    tr_on = SeggerTrainer(
        small_pipeline.graph, TrainConfig(tile_cache_gb=24.0, **kw)
    )
    h_on = tr_on.fit(tiles, max_epochs=2)
    n_on = calls["n"]

    calls["n"] = 0
    tr_off = SeggerTrainer(
        small_pipeline.graph, TrainConfig(tile_cache_gb=0.0, **kw)
    )
    h_off = tr_off.fit(tiles, max_epochs=2)
    n_off = calls["n"]

    assert n_on < n_off  # epoch 2 (and val re-eval) reused extractions
    assert tr_on._tile_cache_bytes > 0
    for a, b in zip(h_on, h_off):
        assert a["train:loss"] == b["train:loss"], (a, b)


def test_checkpoint_resume(small_pipeline, tmp_path):
    cfg = TrainConfig(
        hidden_channels=8, out_channels=8, n_mid_layers=0, n_heads=1,
        max_epochs=2, seed=0, checkpoint_every=1,
        checkpoint_dir=str(tmp_path),
    )
    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    tr = SeggerTrainer(small_pipeline.graph, cfg)
    tr.fit(tiles, max_epochs=2)
    assert (tmp_path / "latest.npz").exists()

    # resume: a fresh trainer continues from epoch 2
    tr2 = SeggerTrainer(small_pipeline.graph, cfg)
    hist2 = tr2.fit(tiles, max_epochs=3)
    assert [h["epoch"] for h in hist2] == [2]


def test_square_tiling_exactly_once(rng):
    pos = rng.uniform(0, 100, (3000, 2))
    tree = square_tiling(pos, side_length=25.0)
    assert tree.is_exactly_once(pos)
    labels = tree.label(pos)
    assert (labels >= 0).all()
    assert tree.n_leaves == 16


def test_polygons_in_polygons(rng):
    from segger_tpu.geometry.query import polygons_in_polygons

    def square(cx, cy, half):
        return np.array(
            [[cx - half, cy - half], [cx + half, cy - half],
             [cx + half, cy + half], [cx - half, cy + half]]
        )

    inner = [square(1, 1, 0.5), square(5, 5, 0.5), square(20, 20, 0.5)]
    outer = [square(1, 1, 2), square(5, 5, 2)]
    ii, oo = polygons_in_polygons(inner, outer)
    assert set(zip(ii.tolist(), oo.tolist())) == {(0, 0), (1, 1)}


def test_stage_timer():
    import time

    from segger_tpu.utils_profiling import StageTimer

    t = StageTimer()
    with t.stage("work", items=100):
        time.sleep(0.01)
    s = t.summary()
    assert s["work"]["calls"] == 1
    assert s["work"]["seconds"] >= 0.01
    assert s["work"]["rate"] > 0


def test_predict_path_releases_tile_cache(small_pipeline):
    """Predict tiles are visited exactly once, so predict() drops the
    epoch-spanning fit cache up front (it pins up to tile_cache_gb of
    host RAM through predict/write for zero reuse — measured 24 GB at
    the 50M-transcript scale) and must not repopulate it."""
    from segger_tpu.data.partition import make_predict_tiles

    tr = SeggerTrainer(
        small_pipeline.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=1, seed=0),
    )
    fit_tiles = make_fit_tiles(small_pipeline.graph,
                               small_pipeline.tree, margin=8.0)
    tr.fit(fit_tiles, max_epochs=1)
    pred_tiles = make_predict_tiles(small_pipeline.graph,
                                    small_pipeline.tree, margin=8.0)
    out = tr.predict(pred_tiles)
    assert out["row_index"].size > 0
    assert tr._tile_cache_bytes == 0
    assert len(tr._tile_cache) == 0


def test_resume_matches_uninterrupted_run(small_pipeline, tmp_path):
    """Epoch streams are derived from the epoch index, so train 3
    epochs straight == train 2, crash, resume for the 3rd (review r2:
    resume used to replay epoch 0's keys and shuffles)."""
    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    # flat loss-weight schedule: the cosine ramp depends on max_epochs,
    # which legitimately differs between the 2-epoch and 3-epoch fits
    kw = dict(hidden_channels=8, out_channels=8, n_mid_layers=0,
              n_heads=1, seed=0,
              tx_weight_start=1.0, tx_weight_end=1.0,
              bd_weight_start=1.0, bd_weight_end=1.0,
              sg_weight_start=0.5, sg_weight_end=0.5)

    tr_full = SeggerTrainer(small_pipeline.graph, TrainConfig(**kw))
    hist_full = tr_full.fit(tiles, max_epochs=3)

    ckpt = TrainConfig(**kw, checkpoint_every=1,
                       checkpoint_dir=str(tmp_path))
    tr_a = SeggerTrainer(small_pipeline.graph, ckpt)
    tr_a.fit(tiles, max_epochs=2)
    tr_b = SeggerTrainer(small_pipeline.graph, ckpt)
    hist_b = tr_b.fit(tiles, max_epochs=3)

    assert hist_b[-1]["epoch"] == 2
    np.testing.assert_allclose(
        hist_b[-1]["train:loss"], hist_full[-1]["train:loss"],
        rtol=1e-5,
    )
    import jax

    for a, b in zip(jax.tree.leaves(tr_full.params),
                    jax.tree.leaves(tr_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_trainer_does_not_mutate_caller_config(small_pipeline):
    """Passing a mesh must not mutate the caller's TrainConfig (review
    r2: shared default instance mutated in place)."""
    from segger_tpu.parallel.mesh import make_mesh

    cfg = TrainConfig(hidden_channels=8, out_channels=8,
                      n_mid_layers=0, n_heads=1, tiles_per_step=1)
    tr = SeggerTrainer(small_pipeline.graph, cfg, mesh=make_mesh(4))
    assert cfg.tiles_per_step == 1          # caller object untouched
    assert tr.cfg.tiles_per_step == 4       # trainer copy rounded
    tr2 = SeggerTrainer(small_pipeline.graph)
    assert tr2.cfg.tiles_per_step == TrainConfig().tiles_per_step


def test_fit_zero_epochs_runs_nothing(small_pipeline):
    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    tr = SeggerTrainer(
        small_pipeline.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1),
    )
    assert tr.fit(tiles, max_epochs=0) == []


def test_fit_on_epoch_end_callback(small_pipeline):
    """The per-epoch callback fires once per epoch with the live
    trainer (used by examples/quality_sweep.py to predict at
    intermediate epochs of one uninterrupted run)."""
    tiles = make_fit_tiles(small_pipeline.graph, small_pipeline.tree,
                           margin=8.0)
    tr = SeggerTrainer(
        small_pipeline.graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=3, scan_steps=1),
    )
    seen = []

    def cb(epoch, trainer):
        assert trainer is tr
        assert trainer.params is not None
        assert len(trainer.history) == epoch + 1
        seen.append(epoch)

    tr.fit(tiles, on_epoch_end=cb)
    assert seen == [0, 1, 2]
