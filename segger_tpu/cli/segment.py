"""`segger-tpu segment`: the main train + predict entry point.

Options are scraped from the PipelineConfig / TrainConfig dataclass
sources by the AST registry — defaults and help text live on the
classes, never duplicated here (reference: cli/segment.py:14-22,63-313).
"""
from __future__ import annotations

import json
from pathlib import Path

_PKG = Path(__file__).resolve().parents[1]

_PIPELINE_NAMES = [
    "cells_representation_mode",
    "cells_embedding_size",
    "cells_min_counts",
    "cells_clusters_n_neighbors",
    "cells_clusters_resolution",
    "genes_min_counts",
    "genes_clusters_n_neighbors",
    "genes_clusters_resolution",
    "transcripts_graph_max_k",
    "transcripts_graph_max_dist",
    "segmentation_graph_mode",
    "prediction_graph_mode",
    "prediction_graph_max_k",
    "prediction_graph_buffer_ratio",
    "tiling_mode",
    "tiling_nodes_per_tile",
    "tiling_side_length",
    "tiling_margin_training",
    "tiling_margin_prediction",
    "gene_corr_reference_path",
    "gene_missing_strategy",
    "seed",
]
_TRAIN_NAMES = [
    "in_channels",
    "hidden_channels",
    "out_channels",
    "n_mid_layers",
    "n_heads",
    "learning_rate",
    "sg_loss_type",
    "tx_margin",
    "sg_margin",
    "tx_weight_start",
    "tx_weight_end",
    "bd_weight_start",
    "bd_weight_end",
    "sg_weight_start",
    "sg_weight_end",
    "update_gene_embedding",
    "use_positional_embeddings",
    "normalize_embeddings",
    "compute_dtype",
    "max_epochs",
    "edges_per_batch",
    "training_fraction",
    "tiles_per_step",
    "shape_merge",
    "seed",
    "checkpoint_every",
    "checkpoint_dir",
    "scan_steps",
    "tile_cache_gb",
]


def _registry():
    from .registry import ParameterRegistry

    reg = ParameterRegistry()
    reg.register_from_file(_PKG / "pipeline.py", "PipelineConfig")
    reg.register_from_file(_PKG / "train" / "trainer.py", "TrainConfig")
    return reg


def add_segment_parser(sub):
    p = sub.add_parser(
        "segment", help="Train the model and segment transcripts"
    )
    p.add_argument("-i", "--input-directory", required=True,
                   help="Standardized (or raw platform) dataset directory")
    p.add_argument("-o", "--output-directory", required=True)
    p.add_argument("--platform", default=None)
    p.add_argument("--nucleus-strategy", default="vendor",
                   choices=["vendor", "intersect"],
                   help="Xenium nucleus geometry: vendor rings as "
                        "shipped (the reference's live behavior) or "
                        "clipped to their cell ring (the reference's "
                        "disabled cell-intersection intent)")
    p.add_argument("--no-anndata", action="store_true",
                   help="Skip segger_anndata.h5ad output")
    p.add_argument("--debug", action="store_true",
                   help="Dump params.json and debug artifacts")
    p.add_argument("--devices", type=int, default=0,
                   help="Shard tile batches over this many devices "
                        "(0 = all available)")
    p.add_argument("--distributed-predict", action="store_true",
                   help="Predict via halo-exchange whole-slide sharding "
                        "over the mesh instead of halo tiles (exact; "
                        "no margins or dedupe)")
    p.add_argument("--distributed-train", action="store_true",
                   help="Train margin-free on the whole strip-sharded "
                        "slide (per-layer halo exchange, exact "
                        "receptive fields) instead of margin tiles")
    p.add_argument("--grid", default=None, metavar="DXxDY",
                   help="Use a 2-D grid decomposition (e.g. 4x2) for "
                        "the distributed train/predict paths instead "
                        "of 1-D strips — for slides large in both axes")
    p.add_argument("--low-memory", action="store_true",
                   help="Stream transcripts into a disk-spooled "
                        "columnar table instead of a whole-slide "
                        "DataFrame, predict via the streaming "
                        "max-merge path, and write with categorical "
                        "cell ids (bounded host RSS for 50M+ "
                        "transcript slides; skips the h5ad export)")
    p.add_argument("--graph-cache", default=None, metavar="DIR",
                   help="Cache the whole-slide graph as a memmappable "
                        "plane in DIR: when present it is loaded "
                        "(memmapped, skipping the host build — edge "
                        "arrays page from disk); otherwise it is "
                        "written after the build.  Enables phased "
                        "prepare-on-CPU / run-on-accelerator workflows")
    p.add_argument("--prepare-only", action="store_true",
                   help="Build features + graph (+ --graph-cache) and "
                        "exit before touching any accelerator")
    _registry().add_arguments(p)
    p.set_defaults(func=run_segment)
    return p


def run_segment(args) -> int:
    from ..io import get_preprocessor
    from ..pipeline import ISTPipeline, PipelineConfig
    from ..train.trainer import SeggerTrainer, TrainConfig
    from ..data.partition import make_fit_tiles, make_predict_tiles
    from ..data.writer import SegmentationWriter

    reg = _registry()
    pipe_kwargs = reg.collect(args, _PIPELINE_NAMES)
    train_kwargs = reg.collect(args, _TRAIN_NAMES)
    out_dir = Path(args.output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.debug:
        with open(out_dir / "params.json", "w") as f:
            json.dump({**pipe_kwargs, **train_kwargs}, f, indent=2,
                      default=str)

    import numpy as np

    cfg = PipelineConfig(**pipe_kwargs)
    cache = Path(args.graph_cache) if args.graph_cache else None
    pipeline = None
    if cache is not None and (cache / "plane" / "tx_gene.npy").exists():
        # phased run: reuse the cached memmapped graph plane — edge
        # arrays and tile indexes page from disk, no host rebuild
        from ..data.assemble import load_host_graph_plane
        from ..data.partition import build_tiling

        graph = load_host_graph_plane(cache / "plane")
        gene_names = np.load(cache / "gene_names.npy",
                             allow_pickle=False)
        tree = build_tiling(
            graph, nodes_per_tile=cfg.tiling_nodes_per_tile,
            mode=cfg.tiling_mode, side_length=cfg.tiling_side_length,
        )
    else:
        pp_kwargs = (
            {"nucleus_strategy": args.nucleus_strategy}
            if args.nucleus_strategy != "vendor" else {}
        )
        pp = get_preprocessor(
            args.input_directory, platform=args.platform, **pp_kwargs
        )
        bd, polys = pp.boundaries
        if args.low_memory:
            from ..data.columnar import ColumnarTranscripts

            tx = ColumnarTranscripts.from_chunks(
                pp.iter_transcripts(),
                spool=out_dir / "transcripts_spool",
            )
        else:
            tx = pp.transcripts
        pipeline = ISTPipeline(tx, bd, polys, cfg)
        pipeline.load()
        graph, tree = pipeline.graph, pipeline.tree
        gene_names = pipeline.adata.var.index.to_numpy().astype(str)
        if cache is not None:
            from ..data.assemble import save_host_graph_plane

            cache.mkdir(parents=True, exist_ok=True)
            save_host_graph_plane(graph, cache / "plane")
            np.save(cache / "gene_names.npy", gene_names)
    if args.prepare_only:
        print(f"Graph prepared"
              + (f"; cached to {cache}" if cache is not None else ""))
        return 0

    mesh = None
    import jax

    n_dev = args.devices or len(jax.devices())
    if n_dev > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)

    trainer = SeggerTrainer(
        graph, TrainConfig(**train_kwargs), mesh=mesh
    )
    grid = None
    if args.grid:
        dx_, dy_ = args.grid.lower().split("x")
        grid = (int(dx_), int(dy_))
    if args.distributed_train:
        trainer.fit_whole_slide(mesh, grid=grid)
    else:
        fit_tiles = make_fit_tiles(
            graph, tree, margin=cfg.tiling_margin_training,
        )
        trainer.fit(fit_tiles)

    if args.debug:
        # debug artifacts for stage-isolated re-runs
        # (reference: writer.py:280-292)
        from ..train.checkpoint import save_checkpoint

        debug_dir = out_dir / "debug"
        debug_dir.mkdir(exist_ok=True)
        save_checkpoint(
            debug_dir / "checkpoint.npz",
            trainer.params,
            trainer.opt_state,
            config={**pipe_kwargs, **train_kwargs},
        )
        if pipeline is not None:
            pipeline.adata.write_h5ad(debug_dir / "adata_debug.h5ad")

    writer = SegmentationWriter(
        out_dir, save_anndata=not args.no_anndata, debug=args.debug
    )
    if args.low_memory and not args.distributed_predict:
        # streaming path: online max-merge dedupe into dense
        # row-addressed arrays (O(n_rows) host memory), categorical
        # cell ids end-to-end
        predict_tiles = make_predict_tiles(
            graph, tree, margin=cfg.tiling_margin_prediction,
        )
        best_sim, best_enc = trainer.predict_streaming(predict_tiles)
        gene_by_row = np.zeros(best_sim.size, np.int32)
        gene_by_row[graph.tx_index] = graph.tx_gene
        writer.write_dense(
            best_sim, best_enc, gene_by_row,
            cell_ids=graph.bd_cell_id, gene_names=gene_names,
        )
    else:
        if args.distributed_predict:
            predictions = trainer.predict_whole_slide(mesh, grid=grid)
        else:
            predict_tiles = make_predict_tiles(
                graph, tree, margin=cfg.tiling_margin_prediction,
            )
            predictions = trainer.predict(predict_tiles)
        writer.write(
            predictions,
            cell_ids=graph.bd_cell_id,
            gene_names=gene_names,
            # the h5ad export consumes a DataFrame; --low-memory and
            # plane-cached runs skip it (the assignment parquet is
            # written either way)
            transcripts=(
                pipeline.transcripts
                if pipeline is not None and not args.low_memory
                else None
            ),
        )
    # training history as CSV (CSVLogger analogue, cli/segment.py:394)
    if trainer.history:
        import pandas as pd

        pd.DataFrame(trainer.history).to_csv(
            out_dir / "metrics.csv", index=False
        )
    print(f"Segmentation written to {out_dir}")
    return 0
