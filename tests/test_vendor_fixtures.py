"""Byte-accurate vendor-layout fixtures (VERDICT r2 item 9).

The frozen directories under tests/fixtures/vendor/ were written to the
VENDOR's on-disk spec by hand (tests/fixtures/vendor/
make_xenium_fixtures.py — parquet BINARY string columns, f32 coords,
extra vendor columns, closed rings, v1 numeric cell ids, vendor-form
version strings), not by the repo's own synthesis helpers.  These tests
fail if a reader regresses on real 10x layouts even when it still
round-trips the repo's writer.
"""
import os

import numpy as np
import pytest

from segger_tpu.io.preprocessor import _infer_platform, get_preprocessor

VENDOR = os.path.join(os.path.dirname(__file__), "fixtures", "vendor")


def _infer_platform_str(d):
    from pathlib import Path

    return _infer_platform(Path(d))
V2 = os.path.join(VENDOR, "xenium_v2")
V1 = os.path.join(VENDOR, "xenium_v1")


def test_v2_inferred():
    assert _infer_platform_str(V2) == "10x_xenium"


def test_v1_inferred():
    assert _infer_platform_str(V1) == "10x_xenium_v1"


def test_v2_transcripts_standardize():
    p = get_preprocessor(V2, "10x_xenium")
    tx = p.transcripts
    # 11 raw rows: 6 controls + 1 low-qv dropped -> 4 kept
    assert len(tx) == 4
    # original row indexes survive filtering
    np.testing.assert_array_equal(
        tx["row_index"].to_numpy(), [0, 1, 2, 10]
    )
    # BINARY parquet strings decoded, not b"..."-stringified
    assert list(tx["feature_name"]) == [
        "GENE_A", "GENE_A", "GENE_B", "GENE_C"
    ]
    assert not any("b'" in f for f in tx["feature_name"].astype(str))
    # compartments: nucleus / cytoplasmic / extracellular / nucleus
    np.testing.assert_array_equal(
        tx["cell_compartment"].to_numpy(), [2, 1, 0, 2]
    )
    # UNASSIGNED -> null (NaN/None both count); vendor ids decoded
    import pandas as pd

    vals = tx["cell_id"].tolist()
    assert vals[0] == vals[1] == "aaaabcde-1"
    assert pd.isna(vals[2])
    assert vals[3] == "aaaabcdf-1"
    # float32 vendor coords arrive exactly (no precision surprise)
    assert tx["x"].iloc[0] == np.float32(10.5)


def test_v2_boundaries():
    p = get_preprocessor(V2, "10x_xenium")
    bd, polys = p.boundaries
    # 2 cells x (cell + nucleus)
    assert len(bd) == 4
    assert set(bd["boundary_type"]) == {"cell", "nucleus"}
    poly = polys[("aaaabcde-1", "cell")]
    # vendor CLOSED ring (5 vertices, first == last) -> open 4-vertex
    # polygon, no duplicated vertex
    assert poly.shape[0] == 4
    assert not np.allclose(poly[0], poly[-1])
    np.testing.assert_allclose(
        sorted(poly[:, 0].tolist()), [12.0, 12.0, 28.0, 28.0]
    )
    # nucleus ring is the smaller square
    nuc = polys[("aaaabcde-1", "nucleus")]
    assert nuc[:, 0].max() - nuc[:, 0].min() == pytest.approx(8.0)


def test_v2_streaming_matches_eager():
    import pandas as pd

    p = get_preprocessor(V2, "10x_xenium")
    eager = p.transcripts
    streamed = pd.concat(
        list(p.iter_transcripts(batch_rows=3)), ignore_index=True
    )
    pd.testing.assert_frame_equal(
        eager.reset_index(drop=True), streamed
    )


def test_v1_transcripts_numeric_sentinel():
    p = get_preprocessor(V1, "10x_xenium_v1")
    tx = p.transcripts
    # 5 raw rows: 1 control + 1 low-qv dropped -> 3 kept
    assert len(tx) == 3
    np.testing.assert_array_equal(
        tx["row_index"].to_numpy(), [0, 1, 2]
    )
    # numeric ids stringified; -1 sentinel -> null
    import pandas as pd

    vals = tx["cell_id"].tolist()
    assert vals[:2] == ["7", "7"] and pd.isna(vals[2])
    np.testing.assert_array_equal(
        tx["cell_compartment"].to_numpy(), [2, 1, 0]
    )


def test_v1_rejected_by_v2_reader_and_vice_versa():
    with pytest.raises(IOError):
        get_preprocessor(V1, "10x_xenium")
    with pytest.raises(IOError):
        get_preprocessor(V2, "10x_xenium_v1")


def test_v1_boundaries_numeric_ids():
    p = get_preprocessor(V1, "10x_xenium_v1")
    bd, polys = p.boundaries
    assert ("7", "cell") in polys and ("12", "nucleus") in polys
    assert polys[("7", "cell")].shape[0] == 4


# ----------------------------------------------------------------------
# CosMX (AtoMx export layout, hand-written 16-bit TIFF label masks)
# ----------------------------------------------------------------------
CX = os.path.join(VENDOR, "cosmx")


def test_cosmx_inferred():
    assert _infer_platform_str(CX) == "nanostring_cosmx"


def test_cosmx_transcripts():
    p = get_preprocessor(CX, "nanostring_cosmx")
    tx = p.transcripts
    # 10 raw rows: 3 controls filtered -> 7 kept
    assert len(tx) == 7
    # composite ids with float-drift coercion ("1.0" -> c_1_1,
    # "2.0" -> c_2_2); extracellular rows null
    import pandas as pd

    vals = tx["cell_id"].tolist()
    assert vals[0] == "c_1_1" and vals[1] == "c_1_1"
    assert vals[2] == "c_1_2"
    assert pd.isna(vals[3]) and pd.isna(vals[4])
    assert vals[5] == "c_2_1" and vals[6] == "c_2_2"
    # compartment remap: Nuclear->2, Cytoplasm/Membrane->1, None/"0"->0
    np.testing.assert_array_equal(
        tx["cell_compartment"].to_numpy(), [2, 1, 1, 0, 0, 2, 1]
    )
    # vendor global-pixel convention: mm offsets / mpp; fov 2's x
    # offset is exactly 1000 px
    assert tx["x"].iloc[5] == pytest.approx(12.0 + 1000.0)
    assert tx["y"].iloc[5] == pytest.approx(1000.0 - 14.0)


def test_cosmx_boundaries_from_handwritten_tiffs():
    p = get_preprocessor(CX, "nanostring_cosmx")
    bd, polys = p.boundaries
    # 2 FOVs x 2 cells x (cell + nucleus rings)
    cell_keys = [k for k in polys if k[1] == "cell"]
    nuc_keys = [k for k in polys if k[1] == "nucleus"]
    assert sorted(k[0] for k in cell_keys) == [
        "c_1_1", "c_1_2", "c_2_1", "c_2_2"
    ]
    assert sorted(k[0] for k in nuc_keys) == [
        "c_1_1", "c_1_2", "c_2_1", "c_2_2"
    ]
    # the cell polygon encloses its nuclear transcript in GLOBAL px
    poly = polys[("c_1_1", "cell")]
    from segger_tpu.geometry.query import points_in_polygon

    assert points_in_polygon(
        np.array([[10.0, 1000.0 - 12.0]]), poly
    ).all()
    # nucleus ring strictly inside the cell ring (areas ordered)
    from segger_tpu.data.neighbors_host import _polygon_area

    assert _polygon_area(polys[("c_1_1", "nucleus")]) < _polygon_area(
        polys[("c_1_1", "cell")]
    )
