"""Out-of-core whole-slide run: bounded-RSS end-to-end at 50-100M
transcripts (VERDICT r2 item 3; reference design point ~600M tx,
/root/reference/src/segger/data/utils/neighbors.py:122-163).

Same pipeline as examples/xenium_scale.py but the transcript table is a
disk-spooled ColumnarTranscripts (typed memmaps, no object columns) and
feature accumulation streams in chunks.  The DataFrame path measured
30 GB peak RSS at 10.5M transcripts (docs/runs/xenium_10m.json) —
~300 GB extrapolated at 100M; this path holds the transcript plane in
O(chunk) + O(cells).

Phases (restartable — the host build is CPU-only and the graph is
cached to ``graph.npz`` via ``data.assemble.save_host_graph``):

    python examples/outofcore_scale.py --n-cells 2000000 \
        --phase prepare --out DIR     # CPU: generate + features + graph
    python examples/outofcore_scale.py --n-cells 2000000 \
        --phase run --out DIR         # accelerator: train/predict/write
    python examples/outofcore_scale.py --n-cells 2000000   # both
"""
import sys

import os

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import tempfile


def _pipeline_cfg(args):
    from segger_tpu.pipeline import PipelineConfig

    return PipelineConfig(
        cells_embedding_size=64,
        genes_min_counts=50,
        cells_min_counts=5,
        tiling_nodes_per_tile=args.tile_nodes,
        tiling_margin_training=10.0,
        tiling_margin_prediction=15.0,
        prediction_graph_mode="cell",
        prediction_graph_buffer_ratio=0.2,
    )


def phase_prepare(args, out_dir, spool, timer):
    """CPU-only host build: generate + features + graph, cached to a
    memmappable graph plane (one .npy per field + tile edge indexes).
    No jax backend is touched, so no accelerator is held idle through
    the (long) host stage."""
    import numpy as np

    from segger_tpu.data.assemble import save_host_graph_plane
    from segger_tpu.data.synthetic import make_synthetic_columnar
    from segger_tpu.pipeline import ISTPipeline
    from segger_tpu.utils import peak_rss_gb
    from segger_tpu.utils_profiling import (
        AnonRSSSampler, StageTimer, set_substage_timer,
    )

    sub = StageTimer()
    set_substage_timer(sub)
    anon = AnonRSSSampler().start()

    with timer.stage("generate"):
        synth = make_synthetic_columnar(
            n_cells=args.n_cells, n_genes=200, mean_tx_per_cell=25,
            extent=400.0 * np.sqrt(args.n_cells / 200), seed=0,
            spool=spool,
        )
    cols = synth.transcripts
    n_tx = cols.n
    print(f"{n_tx} transcripts, {args.n_cells} cells "
          f"(spool: {spool}), rss {peak_rss_gb():.1f} GB", flush=True)

    pipeline = ISTPipeline(cols, synth.boundaries, synth.polygons,
                           _pipeline_cfg(args))
    with timer.stage("features+graph", items=n_tx):
        pipeline.load()
    g = pipeline.graph
    print(
        f"graph: {g.n_tx} tx, {g.n_bd} bd, "
        f"{g.tt_src.size + g.sg_src.size} mp edges, "
        f"{pipeline.tree.n_leaves} tiles, rss {peak_rss_gb():.1f} GB",
        flush=True,
    )
    with timer.stage("save_graph"):
        save_host_graph_plane(g, os.path.join(out_dir, "plane"))
        np.save(
            os.path.join(out_dir, "gene_names.npy"),
            pipeline.adata.var.index.to_numpy().astype(str),
        )
    set_substage_timer(None)
    with open(os.path.join(out_dir, "prepare.json"), "w") as f:
        json.dump(
            {
                "n_transcripts": int(n_tx),
                "n_cells": int(args.n_cells),
                "stages": timer.summary(),
                "substages": sub.summary(),
                "peak_rss_gb": round(peak_rss_gb(), 2),
                "peak_rss_anon_gb": round(anon.stop(), 2),
            },
            f, indent=2,
        )
    print("prepare done, peak rss "
          f"{peak_rss_gb():.1f} GB", flush=True)


def phase_run(args, out_dir, spool, timer):
    """Accelerator phase: reload the cached graph, train, predict,
    write, and score a sample against the spooled ground truth."""
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import pandas as pd

    from segger_tpu.data.assemble import (
        load_host_graph, load_host_graph_plane,
    )
    from segger_tpu.data.partition import (
        build_tiling, make_fit_tiles, make_predict_tiles,
    )
    from segger_tpu.data.writer import SegmentationWriter
    from segger_tpu.metrics import segmentation_report
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig
    from segger_tpu.utils import peak_rss_gb
    from segger_tpu.utils_profiling import (
        AnonRSSSampler, StageTimer, set_substage_timer,
    )

    sub = StageTimer()
    set_substage_timer(sub)
    anon = AnonRSSSampler().start()
    with timer.stage("load_graph"):
        plane = os.path.join(out_dir, "plane")
        if os.path.isdir(plane):
            # memmapped plane: edge arrays + tile indexes page from
            # disk, never resident in anonymous RAM (sublinear-RSS run)
            g = load_host_graph_plane(plane, mmap=not args.no_mmap)
        else:
            g = load_host_graph(os.path.join(out_dir, "graph.npz"))
        gene_names = np.load(os.path.join(out_dir, "gene_names.npy"),
                             allow_pickle=False)
        tree = build_tiling(g, nodes_per_tile=args.tile_nodes)
    n_tx = g.n_tx
    print(f"graph loaded: {n_tx} tx, {g.n_bd} bd, "
          f"rss {peak_rss_gb():.1f} GB", flush=True)

    tc = TrainConfig(
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        max_epochs=args.epochs, scan_steps=8, seed=0,
        compute_dtype=args.dtype,
    )
    trainer = SeggerTrainer(g, tc)
    fit_tiles = make_fit_tiles(g, tree, margin=10.0)
    n_edges = sum(t.n_edges for t in fit_tiles)
    with timer.stage("train", items=n_edges * 4 * args.epochs):
        trainer.fit(fit_tiles)
    print(f"trained, rss {peak_rss_gb():.1f} GB", flush=True)

    predict_tiles = make_predict_tiles(g, tree, margin=15.0)
    with timer.stage("predict", items=n_tx):
        # streaming max-merge into dense row-addressed arrays: O(n_rows)
        # host memory instead of per-tile prediction lists + a
        # duplicated pre-dedupe table (the r3 run's 82.8 GB lever)
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

    # quality on a sample (string-series metrics at full 50M would
    # rebuild the object columns this path exists to avoid)
    rng = np.random.default_rng(0)
    n_eval = min(args.eval_sample, len(seg))
    rows = rng.choice(len(seg), n_eval, replace=False)
    seg_s = seg.iloc[rows]
    truth_code = np.memmap(os.path.join(spool, "truth.bin"),
                           dtype=np.int32, mode="r")
    cell_ids = np.load(os.path.join(spool, "cell_ids.npy"),
                       allow_pickle=False)
    ri = seg_s["row_index"].to_numpy()
    tcs = truth_code[ri]
    truth = pd.Series(
        np.where(tcs >= 0, cell_ids[np.maximum(tcs, 0)], ""), index=ri
    )
    truth = truth[truth != ""]
    report = segmentation_report(seg_s, truth)

    prep = {}
    prep_path = os.path.join(out_dir, "prepare.json")
    if os.path.exists(prep_path):
        with open(prep_path) as f:
            prep = json.load(f)

    log = {
        "n_transcripts": int(n_tx),
        "n_cells": int(args.n_cells),
        "path": "columnar out-of-core (disk-spooled transcript plane; "
                "phased: CPU prepare -> accelerator run)",
        "prepare_stages": prep.get("stages", {}),
        "prepare_substages": prep.get("substages", {}),
        "prepare_peak_rss_gb": prep.get("peak_rss_gb"),
        "prepare_peak_rss_anon_gb": prep.get("peak_rss_anon_gb"),
        "run_stages": timer.summary(),
        "run_substages": sub.summary(),
        "quality_on_sample": {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in report.items()
        },
        "eval_sample": int(n_eval),
        "run_peak_rss_gb": round(peak_rss_gb(), 2),
        "run_peak_rss_anon_gb": round(anon_peak := anon.stop(), 2),
        # this environment's tunneled TPU backend leaks host anon
        # memory per byte transferred (measured 0.94 B/B to-device,
        # 1.55 B/B to-host; tools/tunnel_leak_probe.py) — the
        # framework's own residency is anon minus that staging leak
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
        "graph_plane": "memmapped" if os.path.isdir(
            os.path.join(out_dir, "plane")) and not args.no_mmap
        else "in-RAM",
        "device": str(jax.devices()[0]),
        "dtype": args.dtype,
        "epochs": args.epochs,
        "tile_nodes": args.tile_nodes,
    }
    print("stages:", json.dumps(timer.summary(), indent=2))
    print("quality:", json.dumps(log["quality_on_sample"], indent=2))
    print(f"run peak rss: {log['run_peak_rss_gb']} GB "
          f"(prepare: {log['prepare_peak_rss_gb']} GB)")
    with open(os.path.join(out_dir, "run.json"), "w") as f:
        json.dump(log, f, indent=2)
    print("log:", os.path.join(out_dir, "run.json"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-cells", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--tile-nodes", type=int, default=50_000)
    ap.add_argument("--out", default=None)
    ap.add_argument("--spool", default=None)
    ap.add_argument("--phase", default="all",
                    choices=["all", "prepare", "run"])
    ap.add_argument("--no-mmap", action="store_true",
                    help="load the graph plane fully into RAM "
                         "(RSS-comparison control)")
    ap.add_argument("--eval-sample", type=int, default=2_000_000,
                    help="transcripts sampled for the quality report")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    if args.cpu or args.phase == "prepare":
        # the prepare phase never needs a device; pinning CPU keeps the
        # accelerator free (and untouched) through the long host build
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"

    from segger_tpu.utils_profiling import StageTimer

    out_dir = args.out or tempfile.mkdtemp(prefix="segger_ooc_")
    os.makedirs(out_dir, exist_ok=True)
    spool = args.spool or os.path.join(out_dir, "spool")

    timer = StageTimer()
    if args.phase in ("all", "prepare"):
        phase_prepare(args, out_dir, spool, timer)
    if args.phase in ("all", "run"):
        phase_run(args, out_dir, spool, timer)


if __name__ == "__main__":
    main()
