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


def main_lowmem(args):
    """Whole-slide MERSCOPE run on the columnar plane (BASELINE config
    #4 at scale): streaming raw CSV -> reader chunk standardization ->
    ColumnarTranscripts spool -> features + graph -> train ->
    streaming predict -> dense write -> Delaunay boundary export for
    every predicted cell.  Peak RSS stays O(chunk)+O(cells)."""
    import os

    import jax

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import pandas as pd

    from segger_tpu.data.columnar import ColumnarTranscripts
    from segger_tpu.data.partition import (
        make_fit_tiles, make_predict_tiles,
    )
    from segger_tpu.data.synthetic import (
        make_synthetic_columnar, write_merscope_like_columnar,
    )
    from segger_tpu.data.writer import SegmentationWriter
    from segger_tpu.export.boundary import generate_boundaries
    from segger_tpu.io import get_preprocessor
    from segger_tpu.metrics import segmentation_report
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
    from segger_tpu.utils import peak_rss_gb
    from segger_tpu.utils_profiling import (
        AnonRSSSampler, StageTimer, set_substage_timer,
    )

    timer = StageTimer()
    sub = StageTimer()
    set_substage_timer(sub)
    anon = AnonRSSSampler().start()
    out_dir = args.out or tempfile.mkdtemp(prefix="segger_mer_")
    os.makedirs(out_dir, exist_ok=True)

    with timer.stage("generate+write-raw"):
        synth = make_synthetic_columnar(
            n_cells=args.n_cells, n_genes=200,
            mean_tx_per_cell=args.tx_per_cell,
            extent=400.0 * np.sqrt(args.n_cells / 200), seed=0,
            spool=os.path.join(args.raw_dir or out_dir, "gen_spool"),
        )
        raw_dir = f"{args.raw_dir or out_dir}/raw_merscope"
        if not os.path.exists(
            os.path.join(raw_dir, "detected_transcripts.csv")
        ):
            raw_dir = write_merscope_like_columnar(raw_dir, synth)
    n_raw = synth.transcripts.n
    print(f"{n_raw} transcripts, {args.n_cells} cells (raw: {raw_dir})",
          flush=True)

    with timer.stage("standardize", items=n_raw):
        pp = get_preprocessor(raw_dir)
        assert type(pp).__name__ == "MerscopePreprocessor", type(pp)
        cols = ColumnarTranscripts.from_chunks(
            pp.iter_transcripts(),
            spool=os.path.join(out_dir, "std_spool"),
        )
        bd, polys = pp.boundaries
    n_tx = cols.n
    print(f"standardized via {type(pp).__name__}: {n_tx} rows, "
          f"rss {peak_rss_gb():.1f} GB", flush=True)

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
    pipeline = ISTPipeline(cols, bd, polys, cfg)
    with timer.stage("features+graph", items=n_tx):
        pipeline.load()
    g, tree = pipeline.graph, pipeline.tree
    gene_names = pipeline.adata.var.index.to_numpy().astype(str)
    if args.plane:
        # swap the in-RAM graph for a disk-memmapped plane (the
        # xenium out-of-core run path): no O(E) anonymous residents
        # through train/predict
        from segger_tpu.data.assemble import (
            load_host_graph_plane, save_host_graph_plane,
        )
        from segger_tpu.data.partition import build_tiling

        with timer.stage("save_plane"):
            save_host_graph_plane(g, os.path.join(out_dir, "plane"))
        del g, tree
        pipeline.graph = pipeline.tree = pipeline.adata = None
        g = load_host_graph_plane(os.path.join(out_dir, "plane"))
        tree = build_tiling(g, nodes_per_tile=args.tile_nodes)
    print(f"graph: {g.n_tx} tx, {g.n_bd} bd, "
          f"{tree.n_leaves} tiles, rss {peak_rss_gb():.1f} GB",
          flush=True)

    tc = TrainConfig(
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        max_epochs=args.epochs, scan_steps=8, seed=0,
        compute_dtype="bfloat16",
    )
    trainer = SeggerTrainer(g, tc)
    fit_tiles = make_fit_tiles(g, tree, margin=10.0)
    n_edges = sum(t.n_edges for t in fit_tiles)
    with timer.stage("train", items=n_edges * 4 * args.epochs):
        trainer.fit(fit_tiles)
    print(f"trained, rss {peak_rss_gb():.1f} GB", flush=True)

    predict_tiles = make_predict_tiles(g, tree, margin=15.0)
    with timer.stage("predict", items=n_tx):
        best_sim, best_enc = trainer.predict_streaming(predict_tiles)
    print(f"predicted, rss {peak_rss_gb():.1f} GB", flush=True)

    with timer.stage("write"):
        writer = SegmentationWriter(out_dir, save_anndata=False)
        gene_by_row = np.zeros(best_sim.size, np.int32)
        gene_by_row[g.tx_index] = g.tx_gene
        seg = writer.write_dense(
            best_sim, best_enc, gene_by_row,
            cell_ids=g.bd_cell_id, gene_names=gene_names,
        )

    # Delaunay boundary export for EVERY predicted cell — integer cell
    # codes end-to-end (generate_boundaries factorizes the id column,
    # so codes avoid 40M+ string objects); codes map back to vendor ids
    # in the output table
    x_by_row = np.zeros(best_sim.size, np.float32)
    y_by_row = np.zeros(best_sim.size, np.float32)
    x_by_row[np.asarray(cols.row_index)] = np.asarray(cols.x)
    y_by_row[np.asarray(cols.row_index)] = np.asarray(cols.y)
    rows = np.flatnonzero(best_enc >= 0)
    bounds_in = pd.DataFrame(
        {
            "cell_id": best_enc[rows],
            "x": x_by_row[rows],
            "y": y_by_row[rows],
        }
    )
    n_assigned_cells = int(pd.unique(bounds_in["cell_id"]).size)
    with timer.stage("boundary-export", items=n_assigned_cells):
        boundaries = generate_boundaries(
            bounds_in, method="delaunay", smoothing=args.smoothing,
        )
        boundaries["cell_id"] = np.asarray(g.bd_cell_id)[
            boundaries["cell_id"].to_numpy().astype(np.int64)
        ]
    n_polys = len(boundaries)
    print(f"boundary export: {n_polys} cell polygons "
          f"({n_assigned_cells} assigned cells)", flush=True)

    # quality on a sample (string metrics at full scale would rebuild
    # the object columns this path avoids)
    rng = np.random.default_rng(0)
    n_eval = min(args.eval_sample, len(seg))
    srows = rng.choice(len(seg), n_eval, replace=False)
    seg_s = seg.iloc[srows]
    cell_ids_vocab = np.asarray(synth.transcripts.cell_ids).astype(str)
    ri = seg_s["row_index"].to_numpy()
    tcs = np.asarray(synth.truth_code)[ri]
    truth = pd.Series(
        np.where(tcs >= 0, cell_ids_vocab[np.maximum(tcs, 0)], ""),
        index=ri,
    )
    truth = truth[truth != ""]
    report = segmentation_report(seg_s, truth)

    set_substage_timer(None)
    log = {
        "n_transcripts": int(n_tx),
        "n_cells": int(args.n_cells),
        "n_boundary_polygons": int(n_polys),
        "n_assigned_cells": n_assigned_cells,
        "path": "columnar low-memory whole-slide (streaming raw CSV -> "
                "chunked standardization -> spooled columnar plane)",
        "stages": timer.summary(),
        "substages": sub.summary(),
        "quality_on_sample": {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in report.items()
        },
        "eval_sample": int(n_eval),
        "peak_rss_gb": round(peak_rss_gb(), 2),
        "peak_rss_anon_gb": round(anon_peak := anon.stop(), 2),
        # tunneled-backend staging leak accounting
        # (tools/tunnel_leak_probe.py)
        "tunnel_transfer": {
            "bytes_to_device_gb": round(
                trainer.bytes_to_device / 2**30, 2
            ),
            "bytes_to_host_gb": round(trainer.bytes_to_host / 2**30, 2),
            "est_tunnel_leak_gb": round(
                (0.94 * trainer.bytes_to_device
                 + 1.55 * trainer.bytes_to_host) / 2**30, 2
            ),
            "anon_minus_est_leak_gb": round(
                anon_peak
                - (0.94 * trainer.bytes_to_device
                   + 1.55 * trainer.bytes_to_host) / 2**30, 2
            ),
        },
        "device": str(jax.devices()[0]),
        "epochs": args.epochs,
        "tile_nodes": args.tile_nodes,
    }
    print("stages:", json.dumps(timer.summary(), indent=2))
    print("quality:", json.dumps(log["quality_on_sample"], indent=2))
    print(f"peak RSS: {log['peak_rss_gb']} GB "
          f"(anon {log['peak_rss_anon_gb']} GB)")
    with open(f"{out_dir}/run_log.json", "w") as f:
        json.dump(log, f, indent=2)
    print(f"run log: {out_dir}/run_log.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-cells", type=int, default=4000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--tile-nodes", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoothing", type=int, default=2,
                    help="Chaikin smoothing iterations for boundaries")
    ap.add_argument("--low-memory", action="store_true",
                    help="whole-slide columnar path (streaming "
                         "standardization, spooled transcript plane, "
                         "streaming predict)")
    ap.add_argument("--tx-per-cell", type=int, default=25)
    ap.add_argument("--eval-sample", type=int, default=2_000_000)
    ap.add_argument("--plane", action="store_true",
                    help="swap the in-RAM graph for a disk-memmapped "
                         "plane after the host build (the xenium "
                         "out-of-core run path; no O(E) anonymous "
                         "residents through train/predict)")
    ap.add_argument("--raw-dir", default=None,
                    help="directory for the generated raw MERSCOPE "
                         "files (reused if already present; lets the "
                         "raw write be staged before an accelerator "
                         "run)")
    args = ap.parse_args()

    if args.low_memory:
        main_lowmem(args)
        return

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
