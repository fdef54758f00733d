"""MERSCOPE whole-slide end-to-end run (BASELINE config #4 analogue):
raw Vizgen-format directory -> streaming standardization -> features +
graph -> train -> predict -> write -> Delaunay boundary export for
every predicted cell.

The reference leaves its MERSCOPE reader a stub
(src/segger/io/preprocessor.py MERSCOPE section) but BASELINE names a
MERSCOPE whole-slide run; this exercises the implemented reader
(segger_tpu/io/preprocessor.py:476+) end-to-end, including the
vectorized Delaunay boundary engine (segger_tpu/export/boundary.py) on
every predicted cell.  Committed run logs: docs/runs/.

    python examples/merscope_scale.py                       # TPU
    python examples/merscope_scale.py --cpu                 # CPU mesh
    python examples/merscope_scale.py --n-cells 100000      # whole slide
"""
import sys

import os

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-cells", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--tile-nodes", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoothing", type=int, default=2,
                    help="Chaikin smoothing iterations for boundaries")
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

    from segger_tpu.data.synthetic import make_synthetic, write_merscope_like
    from segger_tpu.io import get_preprocessor
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
    from segger_tpu.data.partition import make_fit_tiles, make_predict_tiles
    from segger_tpu.data.writer import SegmentationWriter
    from segger_tpu.export.boundary import generate_boundaries
    from segger_tpu.metrics import segmentation_report
    from segger_tpu.utils import peak_rss_gb
    from segger_tpu.utils_profiling import StageTimer

    timer = StageTimer()
    out_dir = args.out or tempfile.mkdtemp(prefix="segger_mer_")

    with timer.stage("generate+write-raw"):
        synth = make_synthetic(
            n_cells=args.n_cells, n_genes=200, mean_tx_per_cell=25,
            extent=400.0 * np.sqrt(args.n_cells / 200), seed=0,
        )
        raw_dir = write_merscope_like(f"{out_dir}/raw_merscope", synth)
    n_tx = len(synth.transcripts)
    print(f"{n_tx} transcripts, {args.n_cells} cells (raw: {raw_dir})")

    with timer.stage("standardize", items=n_tx):
        pp = get_preprocessor(raw_dir)
        assert type(pp).__name__ == "MerscopePreprocessor", type(pp)
        tx = pp.transcripts
        bd, polys = pp.boundaries
    print(f"standardized via {type(pp).__name__}: {len(tx)} rows")

    cfg = PipelineConfig(
        cells_embedding_size=64,
        # the gene filter counts NUCLEAR transcripts; at smoke scales a
        # fixed 50 would discard most genes (and their transcripts)
        genes_min_counts=min(50, max(5, n_tx // 400)),
        cells_min_counts=5,
        tiling_nodes_per_tile=args.tile_nodes,
        tiling_margin_training=10.0,
        tiling_margin_prediction=15.0,
        prediction_graph_mode="cell",
        prediction_graph_buffer_ratio=0.2,
    )
    pipeline = ISTPipeline(tx, bd, polys, cfg)
    with timer.stage("features+graph", items=n_tx):
        pipeline.load()
    g = pipeline.graph
    print(f"graph: {g.n_tx} tx, {g.n_bd} bd, {pipeline.tree.n_leaves} tiles")

    tc = TrainConfig(
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        max_epochs=args.epochs, scan_steps=8, seed=0,
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

    # Delaunay boundary export for EVERY predicted cell (config #4's
    # pipeline tail; reference: export/boundary.py:187-217)
    assigned = seg[seg["segger_cell_id"].notna()]
    tx_pos = pipeline.transcripts.set_index(
        pipeline.tx_f.row_index
    ).loc[assigned["row_index"].to_numpy()]
    bounds_in = pd.DataFrame(
        {
            "cell_id": assigned["segger_cell_id"].to_numpy(),
            "x": tx_pos[pipeline.tx_f.x].to_numpy(),
            "y": tx_pos[pipeline.tx_f.y].to_numpy(),
        }
    )
    with timer.stage("boundary-export", items=assigned["segger_cell_id"].nunique()):
        boundaries = generate_boundaries(
            bounds_in, method="delaunay", smoothing=args.smoothing,
        )
    n_polys = len(boundaries)
    print(f"boundary export: {n_polys} cell polygons")

    truth = pd.Series(
        synth.truth_cell,
        index=synth.transcripts["row_index"].to_numpy(),
    )
    truth = truth[truth != ""]
    report = segmentation_report(seg, truth)
    log = {
        "n_transcripts": int(n_tx),
        "n_cells": int(args.n_cells),
        "n_boundary_polygons": int(n_polys),
        "stages": timer.summary(),
        "quality": {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in report.items()
        },
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "device": str(jax.devices()[0]),
        "epochs": args.epochs,
        "tile_nodes": args.tile_nodes,
    }
    print("stages:", json.dumps(timer.summary(), indent=2))
    print("quality:", json.dumps(log["quality"], indent=2))
    print(f"peak RSS: {log['peak_rss_gb']} GB")
    with open(f"{out_dir}/run_log.json", "w") as f:
        json.dump(log, f, indent=2)
    print(f"run log: {out_dir}/run_log.json")
    # only cells with >= 4 assigned transcripts can produce a Delaunay
    # outline; compare coverage against those
    can_outline = int(
        (assigned.groupby("segger_cell_id").size() >= 4).sum()
    )
    assert n_polys > 0.8 * can_outline, (n_polys, can_outline)


if __name__ == "__main__":
    main()
