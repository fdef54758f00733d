"""PhenoGraph-style clustering: kNN -> Jaccard-weighted graph -> Louvain.

CPU re-implementation of the reference's ``phenograph_rapids``
(reference: src/segger/data/utils/neighbors.py:18-51), which uses cuML
NearestNeighbors + cuGraph jaccard + cuGraph louvain.  Here: sklearn kNN,
sparse-matrix Jaccard, and a native Louvain (scipy-sparse based, no
Python-per-node loops in the hot phase).  Off the training hot path, so
CPU is acceptable (SURVEY §7 hard parts).
"""
from __future__ import annotations

import numpy as np
from scipy import sparse as sp


def knn_jaccard_graph(X: np.ndarray, n_neighbors: int) -> sp.csr_matrix:
    """Build the Jaccard-weighted undirected kNN graph.

    Matches cuGraph semantics: the kNN edge list (self included, as cuML
    returns the query point itself) is treated as an undirected simple
    graph; Jaccard weight of edge (u, v) = |N(u) & N(v)| / |N(u) | N(v)|
    over graph neighborhoods.
    """
    from sklearn.neighbors import NearestNeighbors

    n = X.shape[0]
    k = min(n_neighbors, n)
    nn = NearestNeighbors(n_neighbors=k).fit(X)
    _, idx = nn.kneighbors(X)

    rows = np.repeat(np.arange(n), k)
    cols = idx.ravel()
    A = sp.coo_matrix(
        (np.ones(rows.size), (rows, cols)), shape=(n, n)
    ).tocsr()
    # undirected simple graph, no self loops
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A.eliminate_zeros()

    # |N(u) & N(v)| for every existing edge: (A @ A) restricted to edges
    inter = (A @ A).multiply(A)  # csr
    deg = np.asarray(A.sum(axis=1)).ravel()
    inter = inter.tocoo()
    union = deg[inter.row] + deg[inter.col] - inter.data
    w = np.where(union > 0, inter.data / np.maximum(union, 1), 0.0)
    J = sp.coo_matrix((w, (inter.row, inter.col)), shape=(n, n)).tocsr()
    # keep zero-jaccard edges out; isolated nodes become singleton clusters
    J.eliminate_zeros()
    return J


def louvain(
    adj: sp.csr_matrix,
    resolution: float = 1.0,
    seed: int = 0,
    max_levels: int = 10,
    max_sweeps: int = 20,
) -> np.ndarray:
    """Louvain community detection on a weighted undirected graph.

    Vectorized local-moving implementation: each sweep proposes, for every
    node, the neighboring community with maximal modularity gain (computed
    via one sparse matmul onto the community-indicator matrix), applied
    with a deterministic tie-break.  Aggregates and recurses like the
    standard algorithm (cuGraph louvain analogue).
    """
    rng = np.random.default_rng(seed)
    n0 = adj.shape[0]
    # labels: original node -> current super-node of A
    labels = np.arange(n0)
    A = ((adj + adj.T) * 0.5).tocsr()

    for _level in range(max_levels):
        n = A.shape[0]
        m2 = A.sum()  # = 2m for undirected (each edge counted twice)
        if m2 <= 0 or n <= 1:
            break
        k = np.asarray(A.sum(axis=1)).ravel()  # weighted degrees
        comm = np.arange(n)
        improved = False
        Acoo = A.tocoo()
        eu, ev, ew = Acoo.row, Acoo.col, Acoo.data

        for _sweep in range(max_sweeps):
            # Edge-wise sweep, O(E log E): aggregate edge weights per
            # (node, neighbor-community) pair, then take the per-node
            # max modularity gain.  (The earlier dense (n, C) formulation
            # is O(n^2) in the first level where every node is its own
            # community.)
            C = int(comm.max()) + 1
            c_of_v = comm[ev]
            key = eu.astype(np.int64) * C + c_of_v
            uniq, inv = np.unique(key, return_inverse=True)
            Wuc = np.bincount(inv, weights=ew)
            uu = (uniq // C).astype(np.int64)
            cc = (uniq % C).astype(np.int64)
            sigma = np.bincount(comm, weights=k, minlength=C)
            own = cc == comm[uu]
            sig_eff = sigma[cc] - np.where(own, k[uu], 0.0)
            # insertion gain of u into c, with u removed from its own
            # community first (sig_eff excludes u there)
            gain = Wuc - resolution * k[uu] * sig_eff / m2
            # gain of RE-INSERTING into the own community (the baseline
            # a move must beat — comparing against 0 moves nodes out of
            # communities they are tightly bound to).  W(u, own\{u})
            # defaults to 0 for nodes with no intra-community edge and
            # excludes the self-loop, which stays with u either way.
            w_own = np.zeros(n)
            w_own[uu[own]] = Wuc[own]
            w_own = w_own - A.diagonal()
            own_gain = (
                w_own - resolution * k * (sigma[comm] - k) / m2
            )
            gain = gain - own_gain[uu]
            gain = np.where(own, 0.0, gain)
            # per-u argmax over its candidate communities
            order = np.lexsort((-gain, uu))
            uu_s = uu[order]
            first = np.concatenate([[True], uu_s[1:] != uu_s[:-1]])
            best_u = uu_s[first]
            best_c = cc[order][first]
            best_gain = gain[order][first]

            best = comm.copy()
            gain_best = np.zeros(n)
            best[best_u] = best_c
            gain_best[best_u] = best_gain

            move = (gain_best > 1e-12) & (best != comm)
            if not move.any():
                break
            # apply a random subset of moves to avoid oscillation
            apply = move & (rng.uniform(size=n) < 0.7)
            if not apply.any():
                apply = move
            comm = comm.copy()
            comm[apply] = best[apply]
            improved = True

        if not improved:
            break
        # compact community ids and compose original-node mapping
        _, comm = np.unique(comm, return_inverse=True)
        labels = comm[labels]
        C = comm.max() + 1
        if C == n:
            break
        # aggregate graph onto communities
        ind = sp.coo_matrix(
            (np.ones(n), (np.arange(n), comm)), shape=(n, C)
        ).tocsr()
        A = (ind.T @ A @ ind).tocsr()

    _, labels = np.unique(labels, return_inverse=True)
    return labels


def phenograph(
    X: np.ndarray,
    n_neighbors: int,
    resolution: float = 1.0,
    min_size: int = -1,
    seed: int = 0,
) -> np.ndarray:
    """kNN -> Jaccard -> Louvain; clusters sorted by size descending and
    relabeled 0..C-1; clusters with size <= min_size get label -1
    (reference: neighbors.py:44-51)."""
    J = knn_jaccard_graph(np.asarray(X, dtype=np.float64), n_neighbors)
    labels = louvain(J, resolution=resolution, seed=seed)
    # sort clusters by size (desc), relabel, drop small ones
    uniq, counts = np.unique(labels, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    remap = np.full(uniq.max() + 1, -1, dtype=np.int64)
    for new_id, oi in enumerate(order):
        remap[uniq[oi]] = new_id if counts[oi] > min_size else -1
    return remap[labels]
