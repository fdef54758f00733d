"""Stage-scaling profile of the phenograph chain (kNN / Jaccard / Louvain).

Round-4 scale work: the 105M-transcript prepare run pegged one thread for
hours in setup_features; the culprits were exact high-dim kNN (~quadratic:
24 s at 100k, 84 s at 200k points) and the full (A @ A).multiply(A)
SpGEMM (~n^1.3 plus an O(n*k^2) memory blowup).  This script times each
stage of the CURRENT implementation (IVF kNN above the ANN threshold,
edge-wise native Jaccard) at growing n, to document near-linear scaling.

Usage: python tools/profile_clustering.py [n1 n2 ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(sizes):
    from segger_tpu.data.clustering import (
        knn_jaccard_graph,
        louvain,
        ANN_THRESHOLD,
    )
    from segger_tpu.utils_profiling import StageTimer, set_substage_timer

    d, k = 128, 10
    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        # clustered gaussian blobs like real PCA embeddings
        n_blobs = max(8, n // 5000)
        centers = rng.normal(size=(n_blobs, d)) * 5
        lab = rng.integers(0, n_blobs, size=n)
        X = (centers[lab] + rng.normal(size=(n, d))).astype(np.float32)

        # stages timed DIRECTLY via the library's substage hooks (one
        # kNN run, its result reused by the graph build) — subtracting
        # two separate totals folded kNN run-to-run variance into the
        # Jaccard column of the committed scaling artifact
        sub = StageTimer()
        set_substage_timer(sub)
        J = knn_jaccard_graph(X, k)
        set_substage_timer(None)
        t_knn = sub.seconds.get("phenograph.knn", 0.0)
        t_jac = sub.seconds.get("phenograph.jaccard", 0.0)
        knn_kind = "ivf" if n > ANN_THRESHOLD else "exact"

        t0 = time.perf_counter()
        labels = louvain(J, resolution=2.0, seed=0)
        t_lou = time.perf_counter() - t0

        row = dict(
            n=n, knn_kind=knn_kind, knn_s=round(t_knn, 2),
            jaccard_s=round(t_jac, 2), louvain_s=round(t_lou, 2),
            clusters=int(labels.max() + 1),
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [
        50_000, 100_000, 200_000, 400_000, 800_000,
    ]
    main(sizes)
