"""Segmentation quality metrics: transcript-assignment agreement against
a reference labeling.

The reference repository's ``metrics/segment.py`` is dead legacy code
(it references undefined modules and would NameError; SURVEY §2.10);
this module provides the working measurement surface the framework's
golden-metric tests and benchmarks use (BASELINE targets: assignment
F1 / ARI parity on Xenium).
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd


def _align(pred: pd.Series, truth: pd.Series):
    """Join two row_index-indexed cell-id series on common transcripts."""
    common = pred.index.intersection(truth.index)
    return pred.loc[common], truth.loc[common]


def assignment_accuracy(pred: pd.Series, truth: pd.Series) -> float:
    """Fraction of commonly-indexed transcripts assigned to the same
    cell id (only meaningful when both labelings share an id space)."""
    p, t = _align(pred, truth)
    if len(p) == 0:
        return float("nan")
    return float((p.to_numpy() == t.to_numpy()).mean())


def assignment_f1(
    pred: pd.Series, truth: pd.Series, unassigned=None
) -> float:
    """Pairwise F1 over co-assignment: two transcripts are a "pair" when
    they share a cell.  Works across different cell-id spaces (the
    standard segmentation-agreement metric).

    Computed from the contingency table: precision = same-pair pairs in
    pred that are also pairs in truth, etc.
    """
    p, t = _align(pred, truth)
    keep = p.notna() & t.notna()
    if unassigned is not None:
        keep &= (p != unassigned) & (t != unassigned)
    p, t = p[keep], t[keep]
    if len(p) == 0:
        return float("nan")
    _, pi = np.unique(p.to_numpy().astype(str), return_inverse=True)
    _, ti = np.unique(t.to_numpy().astype(str), return_inverse=True)
    n = len(pi)
    # contingency counts
    from scipy import sparse as sp

    C = sp.coo_matrix(
        (np.ones(n), (pi, ti)),
        shape=(pi.max() + 1, ti.max() + 1),
    ).tocsr()
    nij = C.data
    a = np.asarray(C.sum(axis=1)).ravel()  # pred cluster sizes
    b = np.asarray(C.sum(axis=0)).ravel()  # truth cluster sizes

    def pairs(x):
        return (x * (x - 1) / 2).sum()

    tp = pairs(nij)
    pred_pairs = pairs(a)
    truth_pairs = pairs(b)
    if pred_pairs == 0 or truth_pairs == 0:
        return float("nan")
    precision = tp / pred_pairs
    recall = tp / truth_pairs
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def assignment_ari(
    pred: pd.Series, truth: pd.Series, unassigned=None
) -> float:
    """Adjusted Rand index between the two transcript partitions."""
    from sklearn.metrics import adjusted_rand_score

    p, t = _align(pred, truth)
    keep = p.notna() & t.notna()
    if unassigned is not None:
        keep &= (p != unassigned) & (t != unassigned)
    p, t = p[keep], t[keep]
    if len(p) == 0:
        return float("nan")
    return float(
        adjusted_rand_score(
            t.to_numpy().astype(str), p.to_numpy().astype(str)
        )
    )


def cluster_purity(pred: pd.Series, truth: pd.Series) -> float:
    """Mean per-predicted-cell purity: the fraction of its transcripts
    coming from its majority truth cell."""
    p, t = _align(pred, truth)
    keep = p.notna() & t.notna()
    df = pd.DataFrame({"p": p[keep], "t": t[keep]})
    if df.empty:
        return float("nan")
    purities = df.groupby("p")["t"].agg(
        lambda s: s.value_counts().iloc[0] / len(s)
    )
    return float(purities.mean())


def segmentation_report(
    segmentation: pd.DataFrame,
    truth: pd.Series,
    row_index: str = "row_index",
    cell_column: str = "segger_cell_id",
    similarity_column: str = "segger_similarity",
    threshold_column: str = "similarity_threshold",
) -> Dict[str, float]:
    """Summary metrics for a segger segmentation table against a
    ground-truth transcript->cell series (indexed by row_index)."""
    pred = segmentation.set_index(row_index)[cell_column]
    out = {
        "n_transcripts": int(len(segmentation)),
        "fraction_assigned": float(pred.notna().mean()),
        "accuracy": assignment_accuracy(pred, truth),
        "f1": assignment_f1(pred, truth),
        "ari": assignment_ari(pred, truth),
        "purity": cluster_purity(pred, truth),
    }
    if (
        similarity_column in segmentation
        and threshold_column in segmentation
    ):
        kept = segmentation[
            segmentation[similarity_column]
            >= segmentation[threshold_column]
        ]
        pred_thr = kept.set_index(row_index)[cell_column]
        out["fraction_above_threshold"] = float(
            len(kept) / max(len(segmentation), 1)
        )
        out["f1_above_threshold"] = assignment_f1(pred_thr, truth)
    return out
