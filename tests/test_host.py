"""Host-engine tests: geometry, thresholds, anndata-lite, features."""
import numpy as np
import pandas as pd
import pytest
from scipy import sparse as sp

from segger_tpu.geometry.query import points_in_polygon, points_in_polygons
from segger_tpu.geometry.morphology import polygon_area, polygon_props
from segger_tpu.data.threshold import threshold_yen, threshold_li
from segger_tpu.compat.anndata_lite import AnnDataLite, read_h5ad


def square(cx, cy, half):
    return np.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
        ]
    )


def test_point_in_polygon_basic():
    poly = square(0, 0, 1)
    pts = np.array([[0, 0], [0.99, 0.99], [1.5, 0], [0, -2]])
    got = points_in_polygon(pts, poly)
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_point_in_polygon_buffered():
    poly = square(0, 0, 1)
    pts = np.array([[1.3, 0], [0, 1.45], [1.3, 1.3], [2, 2]])
    got = points_in_polygon(pts, poly, distance=0.5)
    # corner point at (1.3,1.3): distance to corner = sqrt(2)*0.3 ~ 0.424
    np.testing.assert_array_equal(got, [True, True, True, False])


def test_points_in_polygons_join(rng):
    polys = [square(0, 0, 1), square(5, 5, 1), square(10, 0, 1)]
    pts = np.array([[0, 0], [5, 5], [10, 0], [2.5, 2.5], [5.2, 4.8]])
    p_idx, g_idx = points_in_polygons(pts, polys)
    pairs = set(zip(p_idx.tolist(), g_idx.tolist()))
    assert pairs == {(0, 0), (1, 1), (2, 2), (4, 1)}


def test_polygon_area_and_props():
    sq = square(0, 0, 2)
    assert abs(polygon_area(sq) - 16.0) < 1e-9
    props = polygon_props([sq])
    assert abs(props.loc[0, "area"] - 16.0) < 1e-9
    assert abs(props.loc[0, "convexity"] - 1.0) < 1e-9
    assert abs(props.loc[0, "elongation"] - 1.0) < 1e-9


def test_threshold_yen_bimodal(rng):
    low = rng.normal(0.2, 0.05, 5000)
    high = rng.normal(0.8, 0.05, 5000)
    t = threshold_yen(np.concatenate([low, high]))
    assert 0.35 < t < 0.65


def test_threshold_li_bimodal(rng):
    low = rng.normal(0.2, 0.05, 5000)
    high = rng.normal(0.8, 0.05, 5000)
    t = threshold_li(np.concatenate([low, high]))
    assert 0.3 < t < 0.7


def test_threshold_li_nonconvergence_raises():
    vals = np.random.default_rng(0).uniform(0, 1, 1000)
    with pytest.raises(StopIteration):
        threshold_li(vals, max_iter=1, tol=0.0)


def test_anndata_lite_h5ad_roundtrip(rng, tmp_path):
    X = sp.random(20, 10, density=0.3, format="csr",
                  random_state=0, dtype=np.float32)
    obs = pd.DataFrame(
        {"n_counts": rng.integers(0, 50, 20),
         "cluster": pd.Categorical(rng.integers(0, 3, 20).astype(str))},
        index=[f"cell_{i}" for i in range(20)],
    )
    var = pd.DataFrame(index=[f"g{i}" for i in range(10)])
    ad = AnnDataLite(
        X, obs, var,
        obsm={"X_spatial": rng.normal(size=(20, 2))},
        varm={"X_corr": rng.normal(size=(10, 4))},
        uns={"similarities": rng.normal(size=(3, 3))},
    )
    path = tmp_path / "t.h5ad"
    ad.write_h5ad(path)
    back = read_h5ad(path)
    np.testing.assert_allclose(back.X.toarray(), X.toarray())
    assert list(back.obs.index) == list(obs.index)
    np.testing.assert_array_equal(
        np.asarray(back.obs["cluster"]), np.asarray(obs["cluster"]).astype(str)
    )
    np.testing.assert_allclose(back.obsm["X_spatial"], ad.obsm["X_spatial"])
    np.testing.assert_allclose(back.uns["similarities"],
                               ad.uns["similarities"])


def test_writer_dedupes_by_max_similarity(rng):
    """Cross-tile duplicate predictions keep the max-similarity row
    (reference: writer.py:199-204)."""
    from segger_tpu.data.writer import assign_transcripts_to_cells

    preds = {
        "row_index": np.array([7, 7, 8, 9, 9, 9]),
        "cell_encoding": np.array([0, 1, 1, 0, 1, -1]),
        "similarity": np.array([0.4, 0.9, 0.5, 0.8, 0.3, 0.2]),
        "gene": np.array([0, 0, 1, 1, 1, 1]),
    }
    seg = assign_transcripts_to_cells(
        preds, cell_ids=np.array(["cA", "cB"]),
        gene_names=np.array(["g0", "g1"]),
    )
    assert len(seg) == 3
    by_row = seg.set_index("row_index")
    assert by_row.loc[7, "segger_cell_id"] == "cB"  # 0.9 beats 0.4
    assert by_row.loc[9, "segger_cell_id"] == "cA"  # 0.8 wins
    np.testing.assert_allclose(by_row.loc[7, "segger_similarity"], 0.9)


def test_anndata_from_transcripts_counts(rng):
    from segger_tpu.data.features import anndata_from_transcripts

    df = pd.DataFrame(
        {
            "feature_name": ["A", "A", "B", "B", "B", "A"],
            "cell": ["c1", "c1", "c1", "c2", None, "c2"],
            "x": [0, 1, 2, 3, 4, 5.0],
            "y": [0, 1, 2, 3, 4, 5.0],
        }
    )
    ad = anndata_from_transcripts(
        df, "feature_name", "cell", coordinate_columns=["x", "y"]
    )
    assert ad.shape == (2, 2)
    dense = ad.X.toarray()
    # c1: A=2, B=1; c2: A=1, B=1
    assert dense[list(ad.obs.index).index("c1")].tolist() == [2, 1]
    assert dense[list(ad.obs.index).index("c2")].tolist() == [1, 1]
    # centroids
    c1 = ad.obsm["X_spatial"][list(ad.obs.index).index("c1")]
    np.testing.assert_allclose(c1, [1.0, 1.0])


def test_polygon_areas_batch_matches_loop(rng):
    from segger_tpu.data.neighbors_host import (
        _polygon_area,
        polygon_areas_batch,
    )

    polys = []
    for _ in range(200):
        nv = int(rng.integers(3, 24))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        r = rng.uniform(2, 9)
        polys.append(
            np.column_stack([r * np.cos(ang), r * np.sin(ang)])
            + rng.uniform(0, 50, 2)
        )
    ref = np.array([_polygon_area(p) for p in polys])
    np.testing.assert_allclose(polygon_areas_batch(polys), ref,
                               rtol=1e-9)
    assert polygon_areas_batch([]).shape == (0,)


def test_threshold_yen_matches_published_pairing(rng):
    """Yen criterion at cut t: foreground second moment excludes bin t
    (review r2: off-by-one vs the published method / skimage)."""
    from segger_tpu.data.threshold import threshold_yen

    def published_yen(values, nbins=256):
        lo, hi = values.min(), values.max()
        counts, edges = np.histogram(values, bins=nbins, range=(lo, hi))
        centers = (edges[:-1] + edges[1:]) / 2
        pmf = counts.astype(np.float64) / counts.sum()
        P1 = np.cumsum(pmf)
        P1_sq = np.cumsum(pmf ** 2)
        P2_sq = np.cumsum(pmf[::-1] ** 2)[::-1]
        with np.errstate(divide="ignore", invalid="ignore"):
            crit = np.log(
                ((P1_sq[:-1] * P2_sq[1:]) ** -1)
                * (P1[:-1] * (1.0 - P1[:-1])) ** 2
            )
        return centers[np.nanargmax(crit)]

    for i in range(20):
        n1, n2 = rng.integers(200, 5000, 2)
        v = np.concatenate([
            rng.normal(0.2, 0.08, n1), rng.normal(0.75, 0.1, n2),
        ])
        assert abs(threshold_yen(v) - published_yen(v)) < 1e-9


def test_louvain_move_criterion(rng):
    """A node tightly bound to its community must not be pulled out by
    a weak external edge (review r2: gains were compared against 0
    instead of against re-inserting into the own community)."""
    import scipy.sparse as sp

    from segger_tpu.data.clustering import louvain

    rows = [0, 1, 0, 2, 1, 2, 3, 4, 0, 3]
    cols = [1, 0, 2, 0, 2, 1, 4, 3, 3, 0]
    w = [1, 1, 1, 1, 1, 1, 1, 1, 0.05, 0.05]
    A = sp.coo_matrix((w, (rows, cols)), shape=(5, 5)).tocsr()
    lab = louvain(A, seed=0)
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] != lab[0]

    # planted 4-block partition is recovered exactly
    n, kc = 200, 4
    truth = np.repeat(np.arange(kc), n // kc)
    rr, cc, ww = [], [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = 0.3 if truth[i] == truth[j] else 0.01
            if rng.uniform() < p:
                rr += [i, j]
                cc += [j, i]
                ww += [1.0, 1.0]
    A = sp.coo_matrix((ww, (rr, cc)), shape=(n, n)).tocsr()
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(truth, louvain(A, seed=0)) > 0.95
