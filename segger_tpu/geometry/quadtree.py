"""Density-adaptive quadtree over 2D points, with the exactly-once
labeling invariant.

The reference builds a cuSpatial GPU quadtree and must detect + retry
overlapping-leaf bugs (reference: src/segger/geometry/quadtree.py:181-202,
segger issue #40).  This host-side quadtree splits half-open boxes
[x0, x1) x [y0, y1) at midpoints, so every point lies in exactly one leaf
by construction — the invariant is structural, not checked-and-retried.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class QuadTree:
    """Adaptive quadtree; leaves partition the (slightly expanded)
    bounding box of the input points."""

    bounds: np.ndarray            # (4,) root x0, y0, x1, y1
    leaf_bounds: np.ndarray       # (L, 4) half-open leaf boxes
    leaf_counts: np.ndarray       # (L,) points per leaf at build time
    max_leaf_size: int
    max_depth: int = 24
    # implicit tree for O(depth) vectorized labeling: children[n, q] =
    # child node id of node n for quadrant q, or -1 at leaves;
    # node_leaf[n] = leaf index when n is a leaf else -1;
    # node_bounds[n] = (x0, y0, x1, y1).  Populated by build(); absent
    # (None) for hand-constructed instances (e.g. square tiling), which
    # fall back to the per-leaf scan.
    children: "np.ndarray | None" = None
    node_leaf: "np.ndarray | None" = None
    node_bounds: "np.ndarray | None" = None

    @classmethod
    def build(
        cls,
        points: np.ndarray,
        max_leaf_size: int,
        max_depth: int = 24,
    ) -> "QuadTree":
        points = np.asarray(points, dtype=np.float64)
        x0, y0 = points.min(axis=0)
        x1, y1 = points.max(axis=0)
        # expand upper edge so max-coordinate points fall inside the
        # half-open root box
        eps = max(x1 - x0, y1 - y0, 1.0) * 1e-9
        x1, y1 = x1 + eps, y1 + eps

        leaves: List[tuple] = []
        counts: List[int] = []
        children: List[list] = []
        node_leaf: List[int] = []
        node_bounds: List[tuple] = []

        def new_node(bx) -> int:
            nid = len(children)
            children.append([-1, -1, -1, -1])
            node_leaf.append(-1)
            node_bounds.append(bx)
            return nid

        def split(idx: np.ndarray, bx, depth: int, nid: int):
            if idx.size <= max_leaf_size or depth >= max_depth:
                node_leaf[nid] = len(leaves)
                leaves.append(bx)
                counts.append(idx.size)
                return
            bx0, by0, bx1, by1 = bx
            mx, my = (bx0 + bx1) / 2, (by0 + by1) / 2
            px, py = points[idx, 0], points[idx, 1]
            right = px >= mx
            top = py >= my
            quads = [
                (idx[~right & ~top], (bx0, by0, mx, my)),
                (idx[right & ~top], (mx, by0, bx1, my)),
                (idx[~right & top], (bx0, my, mx, by1)),
                (idx[right & top], (mx, my, bx1, by1)),
            ]
            for q, (sub_idx, sub_bx) in enumerate(quads):
                cid = new_node(sub_bx)
                children[nid][q] = cid
                split(sub_idx, sub_bx, depth + 1, cid)

        root = new_node((x0, y0, x1, y1))
        split(np.arange(len(points)), (x0, y0, x1, y1), 0, root)
        return cls(
            bounds=np.array([x0, y0, x1, y1]),
            leaf_bounds=np.array(leaves, dtype=np.float64).reshape(-1, 4),
            leaf_counts=np.array(counts, dtype=np.int64),
            max_leaf_size=max_leaf_size,
            max_depth=max_depth,
            children=np.array(children, dtype=np.int64),
            node_leaf=np.array(node_leaf, dtype=np.int64),
            node_bounds=np.array(node_bounds, dtype=np.float64),
        )

    @property
    def n_leaves(self) -> int:
        return len(self.leaf_bounds)

    def label(self, points: np.ndarray) -> np.ndarray:
        """Leaf index per point; -1 for points outside the root box.

        Every in-bounds point matches exactly one leaf (half-open
        boxes).  With the implicit tree: vectorized level-by-level
        descent, O(depth) passes over the points.  Hand-constructed
        instances (no tree, e.g. square tiling) fall back to a per-leaf
        scan.
        """
        points = np.asarray(points, dtype=np.float64)
        x, y = points[:, 0], points[:, 1]

        if self.children is None:
            out = np.full(len(points), -1, dtype=np.int64)
            for li, (x0, y0, x1, y1) in enumerate(self.leaf_bounds):
                m = (x >= x0) & (x < x1) & (y >= y0) & (y < y1)
                out[m] = li
            return out

        rx0, ry0, rx1, ry1 = self.bounds
        inside = (x >= rx0) & (x < rx1) & (y >= ry0) & (y < ry1)
        node = np.zeros(len(points), dtype=np.int64)  # root id = 0
        active = inside & (self.node_leaf[0] < 0)
        while active.any():
            nb = self.node_bounds[node[active]]
            mx = (nb[:, 0] + nb[:, 2]) / 2
            my = (nb[:, 1] + nb[:, 3]) / 2
            quad = (
                (x[active] >= mx).astype(np.int64)
                + 2 * (y[active] >= my).astype(np.int64)
            )
            node[active] = self.children[node[active], quad]
            active = inside & (self.node_leaf[node] < 0)
        out = np.where(inside, self.node_leaf[node], -1)
        return out

    def is_exactly_once(self, points: np.ndarray) -> bool:
        """Validation analogue of the reference's quadtree validity check
        (quadtree.py:261-270): every in-root point hits exactly one leaf."""
        points = np.asarray(points, dtype=np.float64)
        x, y = points[:, 0], points[:, 1]
        hits = np.zeros(len(points), dtype=np.int64)
        for (x0, y0, x1, y1) in self.leaf_bounds:
            hits += (x >= x0) & (x < x1) & (y >= y0) & (y < y1)
        rx0, ry0, rx1, ry1 = self.bounds
        inside = (x >= rx0) & (x < rx1) & (y >= ry0) & (y < ry1)
        return bool((hits[inside] == 1).all() and (hits[~inside] == 0).all())

    def shrunk_mask(
        self, points: np.ndarray, labels: np.ndarray, margin: float
    ) -> np.ndarray:
        """True where a point lies strictly inside its leaf shrunk by
        ``margin`` on every side — the training interior mask
        (reference: src/segger/data/tiling.py:94-127).  Mirrors the
        reference's progressive margin-halving fallback: if a leaf is
        annihilated by the margin (no interior points), halve the margin
        for that leaf until some survive or the margin vanishes."""
        points = np.asarray(points, dtype=np.float64)
        out = np.zeros(len(points), dtype=bool)
        x, y = points[:, 0], points[:, 1]
        # group point indices by leaf once (avoids an O(points) scan
        # per leaf)
        order = np.argsort(labels, kind="stable")
        lab_sorted = labels[order]
        starts = np.searchsorted(lab_sorted, np.arange(self.n_leaves))
        ends = np.searchsorted(
            lab_sorted, np.arange(self.n_leaves), side="right"
        )
        for li, (x0, y0, x1, y1) in enumerate(self.leaf_bounds):
            idx = order[starts[li] : ends[li]]
            if idx.size == 0:
                continue
            m = margin
            while True:
                inner = (
                    (x[idx] >= x0 + m)
                    & (x[idx] < x1 - m)
                    & (y[idx] >= y0 + m)
                    & (y[idx] < y1 - m)
                )
                if inner.any() or m < 1e-6:
                    break
                m /= 2
            out[idx[inner]] = True
        return out

    def expanded_label_multi(
        self, points: np.ndarray, margin: float
    ) -> tuple[np.ndarray, np.ndarray]:
        """(point_idx, leaf_idx) pairs for leaves *expanded* by ``margin``
        — the prediction halo membership (a point can belong to several
        expanded leaves; reference: tile_dataset.py:218-264).

        Uses the C++ grid join when available; the NumPy fallback groups
        points by their own leaf so each expanded leaf only scans the
        points of the (few) leaves its box intersects."""
        points = np.asarray(points, dtype=np.float64)
        from .. import native

        if native.available():
            return native.points_in_boxes(
                points, self.leaf_bounds, margin
            )
        x, y = points[:, 0], points[:, 1]
        labels = self.label(points)
        order = np.argsort(labels, kind="stable")
        lab_sorted = labels[order]
        starts = np.searchsorted(lab_sorted, np.arange(self.n_leaves))
        ends = np.searchsorted(
            lab_sorted, np.arange(self.n_leaves), side="right"
        )
        lb = self.leaf_bounds
        # loop-invariant: out-of-root points (label -1) — computed once,
        # not O(n_leaves) full passes over labels
        outside = np.where(labels == -1)[0]
        p_out, l_out = [], []
        for li, (x0, y0, x1, y1) in enumerate(lb):
            ex0, ey0 = x0 - margin, y0 - margin
            ex1, ey1 = x1 + margin, y1 + margin
            # leaves whose boxes intersect the expanded box
            cand_leaves = np.where(
                (lb[:, 0] < ex1)
                & (lb[:, 2] > ex0)
                & (lb[:, 1] < ey1)
                & (lb[:, 3] > ey0)
            )[0]
            idx_parts = [
                order[starts[cl] : ends[cl]] for cl in cand_leaves
            ]
            # points outside every leaf (label -1) can still fall in an
            # expanded box only if outside the root; root is the union
            # of leaves, and margins extend beyond it — include them
            if outside.size:
                idx_parts.append(outside)
            idx = (
                np.concatenate(idx_parts)
                if idx_parts
                else np.zeros(0, np.int64)
            )
            m = (
                (x[idx] >= ex0)
                & (x[idx] < ex1)
                & (y[idx] >= ey0)
                & (y[idx] < ey1)
            )
            hit = idx[m]
            p_out.append(hit)
            l_out.append(np.full(hit.size, li, dtype=np.int64))
        return np.concatenate(p_out), np.concatenate(l_out)
