"""End-to-end demo on synthetic data: generate -> segment -> score.

Runs the full pipeline on a ground-truth-bearing synthetic slide and
prints assignment quality.  Used by the project verify skill as the
canonical drive; runs on the CPU mesh in ~1 minute.

    python examples/synthetic_e2e.py [output_dir]
"""
import os
import sys

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import pandas as pd

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.train.trainer import TrainConfig
from segger_tpu.metrics import segmentation_report


def main(out_dir=None):
    out_dir = out_dir or tempfile.mkdtemp(prefix="segger_tpu_demo_")
    print(f"output: {out_dir}")

    synth = make_synthetic(
        n_cells=200, n_genes=40, mean_tx_per_cell=25, seed=0
    )
    print(
        f"synthetic slide: {len(synth.transcripts)} transcripts, "
        f"200 cells, 40 genes"
    )

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
    pipeline = ISTPipeline(
        synth.transcripts, synth.boundaries, synth.polygons, cfg
    )
    seg = pipeline.run(
        out_dir,
        train_config=TrainConfig(
            hidden_channels=32, out_channels=32, n_mid_layers=1,
            n_heads=2, max_epochs=8, edges_per_batch=100_000, seed=0,
        ),
    )

    truth = pd.Series(
        synth.truth_cell,
        index=synth.transcripts["row_index"].to_numpy(),
    )
    truth = truth[truth != ""]
    report = segmentation_report(seg, truth)
    print("segmentation report:")
    for k, v in report.items():
        print(f"  {k}: {v:.4f}" if isinstance(v, float) else
              f"  {k}: {v}")
    assert report["accuracy"] > 0.6, "assignment quality regression"
    print("OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
