"""Metrics + attention-introspection tests."""
import numpy as np
import pandas as pd
import jax

from segger_tpu.metrics import (
    assignment_accuracy,
    assignment_f1,
    assignment_ari,
    cluster_purity,
    segmentation_report,
)


def series(vals, idx=None):
    return pd.Series(vals, index=idx if idx is not None
                     else range(len(vals)))


def test_perfect_agreement():
    t = series(["a", "a", "b", "b", "c"])
    # different id space, same partition
    p = series(["x", "x", "y", "y", "z"])
    assert assignment_f1(p, t) == 1.0
    assert assignment_ari(p, t) == 1.0
    assert cluster_purity(p, t) == 1.0


def test_partial_agreement():
    t = series(["a"] * 4 + ["b"] * 4)
    p = series(["x"] * 4 + ["y"] * 2 + ["x"] * 2)
    f1 = assignment_f1(p, t)
    assert 0 < f1 < 1
    acc_same_space = assignment_accuracy(t, t)
    assert acc_same_space == 1.0


def test_unassigned_excluded():
    t = series(["a", "a", "b", "b"])
    p = series(["x", None, "y", "y"])
    f1 = assignment_f1(p, t)
    assert np.isfinite(f1)


def test_segmentation_report_keys():
    seg = pd.DataFrame(
        {
            "row_index": [0, 1, 2, 3],
            "segger_cell_id": ["x", "x", "y", None],
            "segger_similarity": [0.9, 0.8, 0.7, 0.2],
            "similarity_threshold": [0.5, 0.5, 0.5, 0.5],
        }
    )
    truth = series(["a", "a", "b", "b"])
    rep = segmentation_report(seg, truth)
    assert rep["fraction_assigned"] == 0.75
    assert rep["f1"] == 1.0
    assert rep["fraction_above_threshold"] == 0.75


def test_attention_capture(rng):
    """Attention weights retrievable via capture_intermediates — the
    SkipGAT attention_weights analogue (ist_encoder.py:192-211)."""
    import jax.numpy as jnp
    from tests.test_model import make_tile
    from segger_tpu.models import ISTEncoder

    tile = make_tile(rng)
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=0, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    out, state = model.apply(
        params, tile, capture_intermediates=lambda mdl, name:
        name == "attention",
    )
    inter = state["intermediates"]
    # one attention tensor per conv per edge type
    att = inter["conv_0"]["tt"]["attention"][0]
    assert att.shape == (tile.tt.idx.shape[0], tile.tt.idx.shape[1], 2)
    # rows with edges sum to 1
    rowsum = np.asarray(att.sum(axis=1))
    has = np.asarray(tile.tt.mask).any(axis=1)
    np.testing.assert_allclose(rowsum[has], 1.0, rtol=1e-5)
