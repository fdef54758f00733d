"""Quality-saturation sweep: accuracy/F1/fraction-assigned vs epochs.

The reference default is 20 epochs
(/root/reference/src/segger/cli/segment.py:201-205); segger-tpu's
committed whole-slide runs used 2.  This sweep trains ONE uninterrupted
run to 20 epochs on a ~1M-transcript slide and predicts at intermediate
epochs via the fit() on_epoch_end callback — the PRNG streams and the
cosine weight schedule are exactly those of a plain 20-epoch run, so
every point on the curve is a genuine prefix of the same training
trajectory.

    python examples/quality_sweep.py --n-cells 40000 --epochs 20

Committed artifact: docs/runs/quality_sweep_1m.json.
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
    ap.add_argument("--n-cells", type=int, default=40_000)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--eval-epochs", type=int, nargs="+",
                    default=[1, 2, 3, 5, 8, 12, 16, 20])
    ap.add_argument("--tile-nodes", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

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
    from segger_tpu.data.writer import assign_transcripts_to_cells
    from segger_tpu.metrics import segmentation_report
    from segger_tpu.utils import peak_rss_gb

    out_dir = args.out or tempfile.mkdtemp(prefix="segger_sweep_")
    os.makedirs(out_dir, exist_ok=True)
    synth = make_synthetic(
        n_cells=args.n_cells, n_genes=200, mean_tx_per_cell=25,
        extent=400.0 * np.sqrt(args.n_cells / 200), seed=0,
    )
    n_tx = len(synth.transcripts)
    print(f"{n_tx} transcripts, {args.n_cells} cells", flush=True)

    cfg = PipelineConfig(
        cells_embedding_size=64,
        genes_min_counts=50,
        cells_min_counts=5,
        tiling_nodes_per_tile=args.tile_nodes,
        prediction_graph_mode="cell",
        prediction_graph_buffer_ratio=0.2,
    )
    pipeline = ISTPipeline(
        synth.transcripts, synth.boundaries, synth.polygons, cfg
    ).load()
    g = pipeline.graph

    tc = TrainConfig(
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        max_epochs=args.epochs, scan_steps=8, seed=0,
        compute_dtype=args.dtype,
    )
    trainer = SeggerTrainer(g, tc)
    fit_tiles = make_fit_tiles(g, pipeline.tree, margin=10.0)
    predict_tiles = make_predict_tiles(g, pipeline.tree, margin=15.0)

    truth = pd.Series(
        synth.truth_cell,
        index=synth.transcripts["row_index"].to_numpy(),
    )
    truth = truth[truth != ""]

    eval_at = set(args.eval_epochs)
    curve = []
    t0 = time.perf_counter()

    def evaluate(epoch, tr):
        if (epoch + 1) not in eval_at:
            return
        t_eval = time.perf_counter()
        preds = tr.predict(predict_tiles)
        seg = assign_transcripts_to_cells(
            preds, cell_ids=g.bd_cell_id,
            gene_names=pipeline.adata.var.index.to_numpy().astype(str),
        )
        report = segmentation_report(seg, truth)
        point = {
            "epochs": epoch + 1,
            "train_wall_s": round(t_eval - t0 - sum(
                p.get("eval_s", 0) for p in curve), 1),
            "eval_s": round(time.perf_counter() - t_eval, 1),
            **{k: round(v, 4) if isinstance(v, float) else v
               for k, v in report.items()},
        }
        if tr.history:
            point["train_loss"] = round(
                tr.history[-1]["train:loss"], 4
            )
            if "val:loss" in tr.history[-1]:
                point["val_loss"] = round(tr.history[-1]["val:loss"], 4)
        curve.append(point)
        print(json.dumps(point), flush=True)

    trainer.fit(fit_tiles, on_epoch_end=evaluate)

    log = {
        "n_transcripts": int(n_tx),
        "n_cells": int(args.n_cells),
        "max_epochs": args.epochs,
        "curve": curve,
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "tile_nodes": args.tile_nodes,
        "peak_rss_gb": round(peak_rss_gb(), 2),
    }
    path = os.path.join(out_dir, "quality_sweep.json")
    with open(path, "w") as f:
        json.dump(log, f, indent=2)
    print("log:", path)


if __name__ == "__main__":
    main()
