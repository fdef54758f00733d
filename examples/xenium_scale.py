"""Slide-scale end-to-end run with per-stage timing, peak RSS, and
quality metrics.

Defaults give ~100k transcripts (BASELINE config #2 analogue);
``--n-cells 400000`` gives the 10M-transcript single-host whole-slide
run (BASELINE config #3; reference design point
src/segger/data/utils/neighbors.py:159).  Committed run logs:
docs/runs/.

    python examples/xenium_scale.py            # real TPU chip
    python examples/xenium_scale.py --cpu      # virtual CPU mesh
    python examples/xenium_scale.py --n-cells 400000 --epochs 2 \
        --tile-nodes 50000                     # 10M-tx whole slide
"""
import sys

import os

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-cells", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--tile-nodes", type=int, default=25_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import pandas as pd

    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
    from segger_tpu.data.partition import (
        make_fit_tiles, make_predict_tiles,
    )
    from segger_tpu.data.writer import SegmentationWriter
    from segger_tpu.metrics import segmentation_report
    from segger_tpu.utils_profiling import StageTimer

    timer = StageTimer()
    out_dir = args.out or tempfile.mkdtemp(prefix="segger_xen_")

    with timer.stage("generate"):
        synth = make_synthetic(
            n_cells=args.n_cells, n_genes=200, mean_tx_per_cell=25,
            extent=400.0 * np.sqrt(args.n_cells / 200), seed=0,
        )
    n_tx = len(synth.transcripts)
    print(f"{n_tx} transcripts, {args.n_cells} cells")

    cfg = PipelineConfig(
        cells_embedding_size=64,
        genes_min_counts=50,
        cells_min_counts=5,
        tiling_nodes_per_tile=args.tile_nodes,
        tiling_margin_training=10.0,
        tiling_margin_prediction=15.0,
        prediction_graph_mode="cell",
        prediction_graph_buffer_ratio=0.2,
    )
    pipeline = ISTPipeline(
        synth.transcripts, synth.boundaries, synth.polygons, cfg
    )
    with timer.stage("features+graph", items=n_tx):
        pipeline.load()
    g = pipeline.graph
    print(
        f"graph: {g.n_tx} tx, {g.n_bd} bd, "
        f"{g.tt_src.size + g.sg_src.size} mp edges, "
        f"{pipeline.tree.n_leaves} tiles"
    )

    tc = TrainConfig(
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        max_epochs=args.epochs, scan_steps=8, seed=0,
        compute_dtype=args.dtype,
    )
    trainer = SeggerTrainer(g, tc)
    fit_tiles = make_fit_tiles(g, pipeline.tree, margin=10.0)
    n_edges = sum(t.n_edges for t in fit_tiles)
    with timer.stage("train", items=n_edges * 4 * args.epochs):
        trainer.fit(fit_tiles)

    predict_tiles = make_predict_tiles(g, pipeline.tree, margin=15.0)
    with timer.stage("predict", items=n_tx):
        preds = trainer.predict(predict_tiles)

    with timer.stage("write"):
        writer = SegmentationWriter(out_dir, save_anndata=False)
        seg = writer.write(
            preds, cell_ids=g.bd_cell_id,
            gene_names=pipeline.adata.var.index.to_numpy().astype(str),
        )

    truth = pd.Series(
        synth.truth_cell,
        index=synth.transcripts["row_index"].to_numpy(),
    )
    truth = truth[truth != ""]
    report = segmentation_report(seg, truth)
    from segger_tpu.utils import peak_rss_gb

    log = {
        "n_transcripts": int(n_tx),
        "n_cells": int(args.n_cells),
        "stages": timer.summary(),
        "quality": {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in report.items()
        },
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "epochs": args.epochs,
        "tile_nodes": args.tile_nodes,
    }
    print("stages:", json.dumps(timer.summary(), indent=2))
    print("quality:", json.dumps(log["quality"], indent=2))
    print(f"peak RSS: {log['peak_rss_gb']} GB")
    print(f"device: {jax.devices()[0]}")
    with open(f"{out_dir}/run_log.json", "w") as f:
        json.dump(log, f, indent=2)
    print(f"run log: {out_dir}/run_log.json")


if __name__ == "__main__":
    main()
