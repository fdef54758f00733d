"""CLI end-to-end tests: preprocess -> segment -> export -> debug."""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


REPO = Path(__file__).resolve().parents[1]
RUNNER = """
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
import sys
from segger_tpu.cli.main import main
sys.exit(main(sys.argv[1:]))
"""


def run_cli(*args, timeout=600):
    return subprocess.run(
        [sys.executable, "-c", RUNNER, *map(str, args)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from segger_tpu.data.synthetic import write_synthetic_dataset

    d = tmp_path_factory.mktemp("cli_data")
    write_synthetic_dataset(
        d, seed=0, n_cells=120, n_genes=30, mean_tx_per_cell=20
    )
    return d


@pytest.fixture(scope="module")
def segmented(dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_seg")
    r = run_cli(
        "segment", "-i", dataset, "-o", out,
        "--cells-embedding-size", 16,
        "--cells-min-counts", 5,
        "--genes-min-counts", 10,
        "--tiling-nodes-per-tile", 2000,
        "--tiling-margin-training", 10.0,
        "--tiling-margin-prediction", 12.0,
        "--prediction-graph-buffer-ratio", 0.2,
        "--hidden-channels", 16,
        "--out-channels", 16,
        "--n-mid-layers", 0,
        "--max-epochs", 2,
        "--debug",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return out


def test_help_is_fast_and_complete():
    r = run_cli("segment", "--help", timeout=120)
    assert r.returncode == 0
    # registry-scraped options with defaults present in help
    assert "--tiling-nodes-per-tile" in r.stdout
    assert "50000" in r.stdout
    assert "--learning-rate" in r.stdout


def test_segment_outputs(segmented):
    assert (segmented / "segger_segmentation.parquet").exists()
    assert (segmented / "segger_anndata.h5ad").exists()
    assert (segmented / "metrics.csv").exists()
    assert (segmented / "params.json").exists()
    assert (segmented / "debug" / "checkpoint.npz").exists()
    assert (segmented / "debug" / "adata_debug.h5ad").exists()
    seg = pd.read_parquet(segmented / "segger_segmentation.parquet")
    assert {"row_index", "segger_cell_id", "segger_similarity",
            "similarity_threshold"} <= set(seg.columns)
    assert len(seg) > 1000


def test_export_all_elements(dataset, segmented, tmp_path):
    out = tmp_path / "exp"
    r = run_cli(
        "export", "-i", dataset, "-s", segmented, "-o", out,
        "anndata", "transcripts", "boundaries",
        "--threshold-mode", "none",
        "--min-transcripts", 5,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "segger_boundaries.parquet").exists()
    assert (out / "segger_anndata.h5ad").exists()
    assert (out / "segger_transcripts.parquet").exists()
    bd = pd.read_parquet(out / "segger_boundaries.parquet")
    assert bd["cell_id"].nunique() > 20
    # rings have >= 3 vertices
    assert (bd.groupby("cell_id").size() >= 3).all()


def test_debug_segment_only(segmented, tmp_path):
    out = tmp_path / "reseg"
    r = run_cli(
        "debug", "segment-only",
        "-d", segmented / "debug", "-o", out,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    seg = pd.read_parquet(out / "segger_segmentation.parquet")
    orig = pd.read_parquet(segmented / "segger_segmentation.parquet")
    assert len(seg) == len(orig)


def test_debug_predict_only(dataset, segmented, tmp_path):
    out = tmp_path / "repred"
    r = run_cli(
        "debug", "predict-only",
        "-i", dataset,
        "-c", segmented / "debug" / "checkpoint.npz",
        "-o", out,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "segger_segmentation.parquet").exists()


def test_segment_distributed_train_and_predict(dataset, tmp_path):
    """--distributed-train + --distributed-predict: the margin-free
    whole-slide halo-exchange paths end-to-end through the CLI."""
    out = tmp_path / "seg_dist"
    r = run_cli(
        "segment", "-i", dataset, "-o", out,
        "--cells-embedding-size", 16,
        "--cells-min-counts", 5,
        "--genes-min-counts", 10,
        "--tiling-nodes-per-tile", 2000,
        "--hidden-channels", 16,
        "--out-channels", 16,
        "--n-mid-layers", 0,
        "--max-epochs", 2,
        "--no-anndata",
        "--distributed-train",
        "--distributed-predict",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    seg = pd.read_parquet(out / "segger_segmentation.parquet")
    assert len(seg) > 0
    assert seg["segger_cell_id"].notna().mean() > 0.3


def test_every_config_field_reaches_its_config():
    """Every registered dataclass field must be collected into the
    pipeline or train kwargs (review r2: --checkpoint-dir etc. were
    accepted but silently dropped)."""
    import dataclasses

    import segger_tpu.cli.segment as seg
    from segger_tpu.pipeline import PipelineConfig
    from segger_tpu.train.trainer import TrainConfig

    pf = {f.name for f in dataclasses.fields(PipelineConfig)}
    tf = {f.name for f in dataclasses.fields(TrainConfig)}
    assert pf <= set(seg._PIPELINE_NAMES)
    assert tf <= set(seg._TRAIN_NAMES)


def test_numpydoc_description_colon_not_a_header():
    """Description lines containing ':' must not truncate help text
    (review r2)."""
    from segger_tpu.cli.registry import _parse_numpydoc_params

    doc = (
        "Summary.\n\n"
        "    Parameters\n"
        "    ----------\n"
        "    tiling_mode : str\n"
        "        adaptive: split by node count\n"
        "    seed\n"
        "        RNG seed.\n"
    )
    out = _parse_numpydoc_params(doc)
    assert "adaptive" not in out
    assert "split by node count" in out["tiling_mode"]
    assert out["seed"] == "RNG seed."


def test_preprocess_command_standardizes_raw_merscope(tmp_path):
    """`segger-tpu preprocess` on a raw vendor directory writes the
    standardized dataset, which then auto-infers as 'standard'."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from segger_tpu.data.synthetic import (
        make_synthetic,
        write_merscope_like,
    )

    s = make_synthetic(n_cells=60, n_genes=20, mean_tx_per_cell=15,
                       seed=1)
    raw = write_merscope_like(tmp_path / "raw", s)
    out = tmp_path / "std"
    r = run_cli("preprocess", "-i", raw, "-o", out)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "transcripts.parquet").exists()
    assert (out / "boundaries.parquet").exists()

    from segger_tpu.io import get_preprocessor

    pp = get_preprocessor(out)
    assert type(pp).__name__ == "StandardPreprocessor"
    tx = pp.transcripts
    assert len(tx) == len(s.transcripts)


def test_segment_low_memory_matches_dataframe_path(dataset, tmp_path,
                                                   segmented):
    """--low-memory: disk-spooled columnar transcripts through the full
    segment command; assignments must match the DataFrame-path run of
    the same dataset/config exactly (the representation is not allowed
    to change results)."""
    out = tmp_path / "seg_lowmem"
    r = run_cli(
        "segment", "-i", dataset, "-o", out,
        "--cells-embedding-size", 16,
        "--cells-min-counts", 5,
        "--genes-min-counts", 10,
        "--tiling-nodes-per-tile", 2000,
        "--tiling-margin-training", 10.0,
        "--tiling-margin-prediction", 12.0,
        "--prediction-graph-buffer-ratio", 0.2,
        "--hidden-channels", 16,
        "--out-channels", 16,
        "--n-mid-layers", 0,
        "--max-epochs", 2,
        "--low-memory",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (out / "transcripts_spool" / "x.bin").exists()
    got = pd.read_parquet(out / "segger_segmentation.parquet")
    want = pd.read_parquet(segmented / "segger_segmentation.parquet")
    got = got.sort_values("row_index").reset_index(drop=True)
    want = want.sort_values("row_index").reset_index(drop=True)
    assert len(got) == len(want)
    # the streaming writer stores cell ids as a pandas categorical
    # (write_dense); compare values, not dtypes
    assert (
        got["segger_cell_id"].astype(object).fillna("")
        == want["segger_cell_id"].astype(object).fillna("")
    ).mean() > 0.999


def test_segment_graph_cache_phased(dataset, tmp_path):
    """--graph-cache + --prepare-only: the host build caches a
    memmappable graph plane and exits; a second invocation loads the
    plane (no rebuild) and produces a full segmentation."""
    cache = tmp_path / "gcache"
    common = (
        "--cells-embedding-size", 16,
        "--cells-min-counts", 5,
        "--genes-min-counts", 10,
        "--tiling-nodes-per-tile", 2000,
        "--tiling-margin-training", 10.0,
        "--tiling-margin-prediction", 12.0,
        "--prediction-graph-buffer-ratio", 0.2,
        "--hidden-channels", 16,
        "--out-channels", 16,
        "--n-mid-layers", 0,
        "--max-epochs", 1,
    )
    out1 = tmp_path / "prep_out"
    r = run_cli("segment", "-i", dataset, "-o", out1,
                "--graph-cache", cache, "--prepare-only", *common)
    assert r.returncode == 0, r.stderr[-3000:]
    assert (cache / "plane" / "tx_gene.npy").exists()
    assert (cache / "plane" / "_eg_tt_order.npy").exists()
    assert not (out1 / "segger_segmentation.parquet").exists()

    out2 = tmp_path / "run_out"
    r = run_cli("segment", "-i", dataset, "-o", out2,
                "--graph-cache", cache, "--low-memory", *common)
    assert r.returncode == 0, r.stderr[-3000:]
    seg = pd.read_parquet(out2 / "segger_segmentation.parquet")
    assert len(seg) > 0
    assert seg["segger_cell_id"].notna().mean() > 0.5
