"""Cell-boundary polygons from assigned transcripts.

Re-implements the reference's Delaunay-pruned concave outline
(reference: src/segger/export/boundary.py:31-217) without Shapely/GEOS:

  - Delaunay triangulation (scipy), per-edge opposite angles
  - iterative boundary pruning: drop spuriously long edges
    (> 2*connectivity*d_max), then edges spanning very obtuse triangles,
    never orphaning a vertex
  - polygonization of the remaining boundary edges by cycle walking
    (replaces shapely.ops.polygonize), keeping the largest ring
  - optional convex hull method and Chaikin corner-cutting smoothing
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Literal, Optional, Tuple

import numpy as np
import pandas as pd
from scipy.spatial import ConvexHull, Delaunay, cKDTree


def _triangle_angles(
    points: np.ndarray, simplices: np.ndarray
) -> np.ndarray:
    """Interior angles (degrees) at the three vertices of each triangle
    (reference: boundary.py:31-39)."""
    p0 = points[simplices[:, 0]]
    p1 = points[simplices[:, 1]]
    p2 = points[simplices[:, 2]]

    def angle(u, v):
        cos = (u * v).sum(1) / (
            np.linalg.norm(u, axis=1) * np.linalg.norm(v, axis=1) + 1e-12
        )
        return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))

    return np.stack(
        [
            angle(p1 - p0, p2 - p0),
            angle(p0 - p1, p2 - p1),
            angle(p0 - p2, p1 - p2),
        ],
        axis=1,
    )


def chaikin(coords: np.ndarray, iterations: int) -> np.ndarray:
    """Chaikin (1974) corner cutting on a closed ring (no repeated end):
    each vertex is replaced by points at 1/4 and 3/4 of its outgoing edge
    (reference math: boundary.py:42-54)."""
    coords = np.asarray(coords, dtype=np.float64)
    for _ in range(iterations):
        nxt = np.roll(coords, -1, axis=0)
        smoothed = np.empty((len(coords) * 2, 2))
        smoothed[0::2] = 0.75 * coords + 0.25 * nxt
        smoothed[1::2] = 0.25 * coords + 0.75 * nxt
        coords = smoothed
    return coords


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _polygonize_edges(
    points: np.ndarray, edges: List[Tuple[int, int]]
) -> Optional[np.ndarray]:
    """Walk closed cycles in the boundary-edge graph; return the
    largest-area ring (the GEOS polygonize analogue)."""
    adj: Dict[int, List[int]] = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    visited = set()
    best, best_area = None, 0.0
    for start in adj:
        if start in visited:
            continue
        # follow the cycle greedily; at junctions pick an unused edge
        ring = [start]
        used_edges = set()
        cur, prev = start, -1
        while True:
            visited.add(cur)
            nxt = None
            for cand in adj[cur]:
                ekey = (min(cur, cand), max(cur, cand))
                if ekey in used_edges:
                    continue
                nxt = cand
                used_edges.add(ekey)
                break
            if nxt is None:
                break
            if nxt == start:
                # closed ring
                if len(ring) >= 3:
                    coords = points[np.array(ring)]
                    area = _ring_area(coords)
                    if area > best_area:
                        best, best_area = coords, area
                break
            ring.append(nxt)
            prev, cur = cur, nxt
            if len(ring) > len(points) * 2:
                break
    return best


class _CellOutline:
    """Prune a cell's Delaunay triangulation to a concave boundary
    (reference: boundary.py:57-154)."""

    def __init__(self, points: np.ndarray):
        self.tri = Delaunay(points)
        self.points = self.tri.points
        self.d_max = self._nn_max(self.points)
        self.edges = self._build_edges()
        self.degree = np.bincount(
            np.array(list(self.edges), dtype=np.int64).ravel(),
            minlength=len(self.points),
        )

    @staticmethod
    def _nn_max(points: np.ndarray) -> float:
        dist, _ = cKDTree(points).query(points, k=2)
        return float(dist[:, 1].max())

    @staticmethod
    def _simplex_edges(simplex) -> list:
        return [
            tuple(sorted((simplex[i], simplex[(i + 1) % 3])))
            for i in range(3)
        ]

    def _build_edges(self) -> dict:
        angles = _triangle_angles(self.points, self.tri.simplices)
        edges: dict = {}
        for ti, simplex in enumerate(self.tri.simplices):
            for k, edge in enumerate(self._simplex_edges(simplex)):
                if edge not in edges:
                    a, b = edge
                    edges[edge] = {
                        "tri": {},
                        "length": float(
                            np.linalg.norm(self.points[a] - self.points[b])
                        ),
                    }
                # angle opposite this edge within triangle ti
                edges[edge]["tri"][ti] = angles[ti][(k + 2) % 3]
        return edges

    def _drop_edge(self, edge) -> bool:
        a, b = edge
        if self.degree[a] <= 1 or self.degree[b] <= 1:
            return False
        del self.edges[edge]
        self.degree[a] -= 1
        self.degree[b] -= 1
        return True

    def _prune(self, predicate) -> None:
        boundary = [e for e in self.edges if len(self.edges[e]["tri"]) < 2]
        changed = True
        while changed:
            changed, nxt = False, []
            for edge in boundary:
                info = self.edges.get(edge)
                if info is None:
                    continue
                if not info["tri"]:
                    if not self._drop_edge(edge):
                        nxt.append(edge)
                    continue
                ti = next(iter(info["tri"]))
                if predicate(info, ti) and self._drop_edge(edge):
                    for other in self._simplex_edges(
                        self.tri.simplices[ti]
                    ):
                        if other != edge and other in self.edges:
                            self.edges[other]["tri"].pop(ti, None)
                            nxt.append(other)
                    changed = True
                else:
                    nxt.append(edge)
            boundary = nxt

    def refine(self, connectivity: float = 2.0) -> "_CellOutline":
        d_max = self.d_max
        # Phase 1: spuriously long boundary edges (boundary.py:137)
        self._prune(
            lambda info, ti: info["length"] > 2 * connectivity * d_max
        )
        # Phase 2: very obtuse (concave) spans (boundary.py:139-143)
        max_angle = 180 - (180 / 16) / connectivity
        self._prune(
            lambda info, ti: (
                info["length"] > 1.5 * connectivity * d_max
                and info["tri"][ti] > 90
            )
            or info["tri"][ti] > max_angle
        )
        return self

    def polygon(self) -> Optional[np.ndarray]:
        boundary_edges = [
            e for e in self.edges if len(self.edges[e]["tri"]) < 2
        ]
        return _polygonize_edges(self.points, boundary_edges)


def cell_boundary(
    points: np.ndarray,
    method: Literal["delaunay", "convex_hull"] = "delaunay",
    smoothing: int = 0,
    connectivity: float = 2.0,
) -> Optional[np.ndarray]:
    """Boundary ring (V, 2) for one cell's transcript coordinates, or
    None if degenerate (reference: boundary.py:157-184)."""
    points = np.asarray(points, dtype=np.float64)
    if np.unique(points, axis=0).shape[0] < 3:
        return None
    if method == "convex_hull":
        try:
            hull = ConvexHull(points)
            poly = points[hull.vertices]
        except Exception:
            return None
    elif method == "delaunay":
        try:
            poly = _CellOutline(points).refine(connectivity).polygon()
        except Exception:
            poly = None
    else:
        raise ValueError(
            f"Unknown boundary method: {method!r} "
            "(use 'delaunay' or 'convex_hull')."
        )
    if poly is None:
        return None
    if smoothing > 0:
        poly = chaikin(poly, smoothing)
    return poly


def generate_boundaries(
    transcripts: pd.DataFrame,
    cell_id: str = "cell_id",
    x: str = "x",
    y: str = "y",
    method: Literal["delaunay", "convex_hull"] = "delaunay",
    smoothing: int = 0,
    connectivity: float = 2.0,
    progress: bool = False,
) -> pd.DataFrame:
    """Per-cell boundary table: cell_id, n_transcripts, polygon (ndarray)
    (reference: boundary.py:187-217).  Cells with degenerate outlines are
    dropped."""
    ids, n_tx, geoms = [], [], []
    groups = transcripts.groupby(cell_id)
    it = groups
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(groups, total=groups.ngroups,
                      desc="Building cell boundaries")
        except ImportError:
            pass
    for cid, g in it:
        poly = cell_boundary(
            g[[x, y]].to_numpy(), method=method, smoothing=smoothing,
            connectivity=connectivity,
        )
        if poly is not None:
            ids.append(str(cid))
            n_tx.append(len(g))
            geoms.append(poly)
    return pd.DataFrame(
        {"cell_id": ids, "n_transcripts": n_tx, "polygon": geoms}
    ).set_index(pd.Index(ids, name="cell_id"))
