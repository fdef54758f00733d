"""Contamination QC tests."""
import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sp

from segger_tpu.compat.anndata_lite import AnnDataLite
from segger_tpu.validation import (
    get_neighbor_frequencies,
    calculate_contamination,
    contamination_flow,
    group_reference,
    expression_summary_from_anndata,
)


@pytest.fixture()
def toy_adata(rng):
    """Two spatially separated cell types with distinct marker genes,
    plus some cross-contaminating counts."""
    n_a, n_b, g = 30, 30, 6
    genes = [f"G{i}" for i in range(g)]
    # type A expresses G0-2, type B expresses G3-5
    X = np.zeros((n_a + n_b, g))
    X[:n_a, :3] = rng.poisson(5, (n_a, 3))
    X[n_a:, 3:] = rng.poisson(5, (n_b, 3))
    # contamination: A cells get stray B-marker counts
    X[:n_a, 4] += rng.poisson(1.0, n_a)
    pos = np.vstack(
        [rng.normal([0, 0], 3, (n_a, 2)), rng.normal([100, 0], 3, (n_b, 2))]
    )
    ad = AnnDataLite(
        sp.csr_matrix(X),
        obs=pd.DataFrame(
            {"cell_type": ["A"] * n_a + ["B"] * n_b},
            index=[f"c{i}" for i in range(n_a + n_b)],
        ),
        var=pd.DataFrame(index=genes),
        obsm={"X_spatial": pos},
        layers={"counts": sp.csr_matrix(X)},
    )
    return ad


@pytest.fixture()
def reference():
    rows = []
    for gi in range(3):
        rows.append(("A", f"G{gi}", 0.9, 2.0, 100, 90))
        rows.append(("B", f"G{gi}", 0.02, 0.1, 100, 2))
    for gi in range(3, 6):
        rows.append(("A", f"G{gi}", 0.02, 0.1, 100, 2))
        rows.append(("B", f"G{gi}", 0.9, 2.0, 100, 90))
    return pd.DataFrame(
        rows,
        columns=["cell_type_name", "gene_name", "pc", "me",
                 "n_cells_cell_type", "n"],
    )


def test_neighbor_frequencies_spatial_separation(toy_adata):
    df = get_neighbor_frequencies(
        toy_adata, k=5, col="cell_type", max_distance=20.0
    )
    # A cells are surrounded by A cells
    assert df.iloc[:30]["A"].mean() > 0.95
    assert df.iloc[30:]["B"].mean() > 0.95
    np.testing.assert_allclose(df.sum(1), 1.0, rtol=1e-6)


def test_calculate_contamination_flags_stray_counts(toy_adata, reference):
    calculate_contamination(
        toy_adata,
        reference,
        counts_layer="counts",
        spatial_key="X_spatial",
        cell_type_key="cell_type",
    )
    for layer in ("q_self", "q_neighbor", "q_background",
                  "contamination"):
        assert layer in toy_adata.layers
    # posteriors sum to ~1 on populated entries
    qs = toy_adata.layers["q_self"].tocoo()
    qn = toy_adata.layers["q_neighbor"].tocsr()
    qb = toy_adata.layers["q_background"].tocsr()
    total = (
        qs.data
        + np.asarray(qn[qs.row, qs.col]).ravel()
        + np.asarray(qb[qs.row, qs.col]).ravel()
    )
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)

    pc = toy_adata.obs["percent_contamination"].to_numpy()
    # A cells (with stray B-marker G4 counts) are more contaminated
    assert pc[:30].mean() > pc[30:].mean()
    assert pc[:30].mean() > 1.0


def test_contamination_flow_direction(toy_adata, reference):
    calculate_contamination(
        toy_adata, reference,
        counts_layer="counts", spatial_key="X_spatial",
        cell_type_key="cell_type",
    )
    flow = contamination_flow(
        toy_adata, reference,
        cell_type_key="cell_type", counts_layer="counts",
    )
    # contamination in A hosts comes from B donors
    assert flow.loc["B", "A"] > flow.loc["A", "A"]
    assert flow.loc["B", "A"] > flow.loc["B", "B"]


def test_group_reference_aggregates(reference):
    grouped = group_reference(reference, {"A": "AB", "B": "AB"})
    assert set(grouped["cell_type_name"]) == {"AB"}
    g0 = grouped[grouped["gene_name"] == "G0"].iloc[0]
    # counts sum across grouped types
    assert g0["n_cells_cell_type"] == 200
    assert g0["n"] == 92
    # weighted mean of mean expression
    want_me = (2.0 * 90 + 0.1 * 2) / 92
    np.testing.assert_allclose(g0["me"], want_me, rtol=1e-6)


def test_expression_summary_roundtrip(toy_adata):
    summary = expression_summary_from_anndata(
        toy_adata, "cell_type", "counts"
    )
    assert {"cell_type_name", "gene_name", "pc", "me", "n",
            "n_cells_cell_type"} <= set(summary.columns)
    # A cells are positive for G0 in nearly all cells
    a_g0 = summary[
        (summary.cell_type_name == "A") & (summary.gene_name == "G0")
    ]
    assert len(a_g0) == 1 and a_g0.iloc[0]["pc"] > 0.8
    # B cells have no G0 expression -> row filtered out
    b_g0 = summary[
        (summary.cell_type_name == "B") & (summary.gene_name == "G0")
    ]
    assert len(b_g0) == 0
