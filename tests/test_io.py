"""Platform IO tests: registry inference + reader standardization."""
import json

import numpy as np
import pandas as pd
import pytest

from segger_tpu.data.synthetic import (
    make_synthetic,
    write_synthetic_dataset,
    write_xenium_like,
    write_merscope_like,
)
from segger_tpu.io import (
    get_preprocessor,
    StandardTranscriptFields,
    StandardBoundaryFields,
)
from segger_tpu.io.wkb import wkb_to_polygon


@pytest.fixture(scope="module")
def synth():
    return make_synthetic(n_cells=30, n_genes=15, mean_tx_per_cell=10,
                          seed=1)


def _check_standard_transcripts(tx):
    f = StandardTranscriptFields()
    for col in (f.row_index, f.x, f.y, f.feature, f.cell_id,
                f.compartment):
        assert col in tx.columns, col
    assert set(np.unique(tx[f.compartment])) <= {0, 1, 2}
    # extracellular transcripts carry no cell id
    extra = tx[tx[f.compartment] == f.extracellular_value]
    assert extra[f.cell_id].isna().all()


def test_standard_roundtrip(tmp_path, synth):
    d = tmp_path / "std"
    write_synthetic_dataset(d, seed=1, n_cells=30, n_genes=15,
                            mean_tx_per_cell=10)
    pp = get_preprocessor(d)
    assert type(pp).__name__ == "StandardPreprocessor"
    _check_standard_transcripts(pp.transcripts)
    bd, polys = pp.boundaries
    assert len(bd) == 60  # 30 cells x 2 boundary types
    assert all(len(p) >= 3 for p in polys.values())


def test_xenium_reader(tmp_path, synth):
    d = write_xenium_like(tmp_path / "xen", synth)
    pp = get_preprocessor(d)
    assert type(pp).__name__ == "XeniumPreprocessor"
    tx = pp.transcripts
    _check_standard_transcripts(tx)
    # same transcript count (all QV pass, no control probes in synth)
    assert len(tx) == len(synth.transcripts)
    # compartments survive the round trip
    f = StandardTranscriptFields()
    want = synth.transcripts.sort_values(f.x)[f.compartment].to_numpy()
    got = tx.sort_values(f.x)[f.compartment].to_numpy()
    np.testing.assert_array_equal(got, want)
    bd, polys = pp.boundaries
    b = StandardBoundaryFields()
    assert set(bd[b.boundary_type]) == {b.cell_value, b.nucleus_value}
    assert bd[b.contains_nucleus].all()  # every synth cell has a nucleus


def test_xenium_v1_sentinel(tmp_path, synth):
    d = write_xenium_like(tmp_path / "xen1", synth)
    # rewrite as v1: numeric sentinel + 1.x version
    with open(d / "experiment.xenium", "w") as f:
        json.dump({"analysis_sw_version": "xenium-1.9.0"}, f)
    raw = pd.read_parquet(d / "transcripts.parquet")
    raw["cell_id"] = raw["cell_id"].replace("UNASSIGNED", "-1")
    raw.to_parquet(d / "transcripts.parquet", index=False)

    pp = get_preprocessor(d)
    assert type(pp).__name__ == "XeniumPreprocessorV1"
    tx = pp.transcripts
    _check_standard_transcripts(tx)
    assert (tx[StandardTranscriptFields().cell_id] == "-1").sum() == 0


def test_merscope_reader(tmp_path, synth):
    d = write_merscope_like(tmp_path / "mer", synth)
    pp = get_preprocessor(d)
    assert type(pp).__name__ == "MerscopePreprocessor"
    tx = pp.transcripts
    _check_standard_transcripts(tx)
    f = StandardTranscriptFields()
    # nucleus compartment recovered from polygon containment: most
    # truly-nuclear transcripts should be recovered
    want_nuc = synth.transcripts[f.compartment] == f.nucleus_value
    got_nuc = tx[f.compartment] == f.nucleus_value
    overlap = (want_nuc.to_numpy() & got_nuc.to_numpy()).sum()
    assert overlap / max(want_nuc.sum(), 1) > 0.7
    bd, polys = pp.boundaries
    assert len(polys) == 60


def test_wkb_roundtrip():
    from segger_tpu.data.synthetic import _polygon_to_wkb

    poly = np.array([[0, 0], [4, 0], [4, 3], [0, 3]], dtype=np.float64)
    back = wkb_to_polygon(_polygon_to_wkb(poly))
    np.testing.assert_allclose(back[:4], poly)


def test_platform_inference_rejects_ambiguous(tmp_path, synth):
    with pytest.raises(ValueError, match="Could not infer"):
        get_preprocessor(tmp_path)


def test_xenium_streaming_matches_eager(tmp_path, synth):
    """iter_transcripts batches concatenate to the eager table; a
    streaming save round-trips identically."""
    d = write_xenium_like(tmp_path / "xen_s", synth)
    pp = get_preprocessor(d)
    eager = pp.transcripts
    chunks = list(pp.iter_transcripts(batch_rows=100))
    assert len(chunks) > 1
    streamed = pd.concat(chunks, ignore_index=True)
    pd.testing.assert_frame_equal(streamed, eager)

    out = tmp_path / "std_stream"
    pp.save(out, streaming=True, batch_rows=100)
    pp2 = get_preprocessor(out)
    assert len(pp2.transcripts) == len(eager)
    f = StandardTranscriptFields()
    np.testing.assert_array_equal(
        pp2.transcripts[f.row_index].to_numpy(),
        eager[f.row_index].to_numpy(),
    )


def test_save_standardizes(tmp_path, synth):
    d = write_xenium_like(tmp_path / "xen2", synth)
    out = tmp_path / "std_out"
    pp = get_preprocessor(d)
    pp.save(out)
    pp2 = get_preprocessor(out)
    assert type(pp2).__name__ == "StandardPreprocessor"
    assert len(pp2.transcripts) == len(pp.transcripts)
    _, polys = pp2.boundaries
    assert len(polys) == 60


def test_merscope_streaming_matches_eager(tmp_path, synth):
    """MERSCOPE chunked CSV standardization concatenates to the eager
    table (incl. containment-derived nucleus compartments)."""
    d = write_merscope_like(tmp_path / "mer_s", synth)
    pp = get_preprocessor(d)
    eager = pp.transcripts
    chunks = list(pp.iter_transcripts(batch_rows=150))
    assert len(chunks) > 1
    streamed = pd.concat(chunks, ignore_index=True)
    pd.testing.assert_frame_equal(streamed, eager)

    out = tmp_path / "mer_std"
    pp.save(out, streaming=True, batch_rows=150)
    pp2 = get_preprocessor(out)
    assert len(pp2.transcripts) == len(eager)
