"""Padded-CSR: the core sparse-graph layout of segger-tpu.

The reference (dpeerlab/segger) stores graphs as dynamic-length COO edge
lists and leans on torch_scatter/PyG segment ops (CUDA atomics) for
aggregation.  On TPU, XLA wants static shapes and the VPU/MXU want dense,
tiled operands — so segger-tpu's primary layout is a *padded neighbor
table*: for every destination node, up to K source indices plus a validity
mask.  Row-wise masked reductions then replace scatter ops entirely:

  - segment-softmax  -> masked row softmax        (GATv2 attention)
  - SpMM (scatter-add)-> gather + masked row sum  (neighbor aggregation)
  - segment-max       -> masked row max/argmax    (prediction assignment)

This mirrors the padded-table <-> CSR duality the reference itself exploits
in ``knn_to_edge_index``/``edge_index_to_knn``
(reference: src/segger/data/utils/neighbors.py:54-119).

Host-side converters are NumPy (data pipeline); device-side ops live in
``segger_tpu.ops.gather_agg``.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PaddedCSR:
    """A fixed-shape neighbor table for one edge type.

    Attributes
    ----------
    idx : (N_dst, K) int32
        Source-node indices; arbitrary (but in-range) where invalid.
    mask : (N_dst, K) bool
        True where the slot holds a real edge.
    """

    idx: jnp.ndarray
    mask: jnp.ndarray

    @property
    def n_dst(self) -> int:
        return self.idx.shape[0]

    @property
    def k(self) -> int:
        return self.idx.shape[1]

    @property
    def n_edges(self):
        return self.mask.sum()


def coo_to_padded_csr(
    dst: np.ndarray,
    src: np.ndarray,
    n_dst: int,
    k: Optional[int] = None,
    pad_to_multiple: int = 1,
) -> PaddedCSR:
    """Convert a COO edge list to a padded-CSR neighbor table (host side).

    Semantics match the reference's ``edge_index_to_knn``
    (src/segger/data/utils/neighbors.py:95-119) but are keyed on the
    *destination* node (the aggregation target) and produce an explicit
    mask instead of a -1 sentinel.

    Parameters
    ----------
    dst, src : (E,) integer arrays
        Edge endpoints; ``dst`` indexes the aggregation target.
    n_dst : int
        Number of destination nodes (rows of the table).
    k : int, optional
        Row width.  Defaults to the max in-degree.  Edges beyond ``k``
        per destination are dropped (callers control ``k`` via bucketing).
    pad_to_multiple : int
        Round ``k`` up to a multiple (lane-friendly widths, e.g. 8).
    """
    dst = np.asarray(dst, dtype=np.int64)
    src = np.asarray(src, dtype=np.int64)
    if dst.size == 0:
        kk = max(k or 1, 1)
        kk = -(-kk // pad_to_multiple) * pad_to_multiple
        return PaddedCSR(
            idx=np.zeros((n_dst, kk), dtype=np.int32),
            mask=np.zeros((n_dst, kk), dtype=bool),
        )

    order = np.argsort(dst, kind="stable")
    dst_s, src_s = dst[order], src[order]
    # position of each edge within its destination's block
    counts = np.bincount(dst_s, minlength=n_dst)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(dst_s.size) - offsets[dst_s]

    max_deg = int(counts.max()) if counts.size else 0
    if k is None:
        k = max(max_deg, 1)
    k = max(int(k), 1)
    width = -(-k // pad_to_multiple) * pad_to_multiple

    keep = pos < k
    idx = np.zeros((n_dst, width), dtype=np.int32)
    mask = np.zeros((n_dst, width), dtype=bool)
    idx[dst_s[keep], pos[keep]] = src_s[keep].astype(np.int32)
    mask[dst_s[keep], pos[keep]] = True
    return PaddedCSR(idx=idx, mask=mask)


def padded_csr_to_coo(csr: PaddedCSR) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`coo_to_padded_csr` (host side).

    Returns ``(dst, src)`` arrays of the valid edges, row-major order
    (matches the reference's ``knn_to_edge_index``,
    src/segger/data/utils/neighbors.py:54-92).
    """
    idx = np.asarray(csr.idx)
    mask = np.asarray(csr.mask)
    n_dst, k = idx.shape
    rows = np.repeat(np.arange(n_dst, dtype=np.int64), k).reshape(n_dst, k)
    return rows[mask], idx[mask].astype(np.int64)


def transpose_csr(
    csr: PaddedCSR, n_src: int, k: Optional[int] = None,
    pad_to_multiple: int = 1,
) -> PaddedCSR:
    """Transpose table: for each *source* node, the flattened slot
    positions (dst * K + k) of the edges it feeds (host side).

    This is the gradient routing table for :func:`gather-based backward
    <segger_tpu.ops.gather_agg.csr_gather_t>`: the VJP of a padded-CSR
    gather gathers the cotangent rows through this table instead of
    scatter-adding — scatters serialize on TPU, gathers vectorize.

    Width defaults to the EXACT max out-degree: backward gathers are
    random-ROW-rate bound, so fewer gathered rows beat tile alignment —
    measured head to head on the bench step (v5e, r3): exact Kt (5/3)
    gives bwd 11.8 ms vs 14.1 ms at 4-rounded widths (8/4), even
    though the exact width pays a physical flat->3-D relayout before
    the reduce (the middle dim pads to sublane multiples).
    """
    idx = np.asarray(csr.idx)
    mask = np.asarray(csr.mask)
    n_dst, kk = idx.shape
    flat_pos = np.arange(n_dst * kk, dtype=np.int64)[mask.ravel()]
    srcs = idx.ravel()[mask.ravel()].astype(np.int64)
    if k is not None and srcs.size:
        max_out = int(np.bincount(srcs, minlength=n_src).max())
        if k < max_out:
            raise ValueError(
                f"transpose width k={k} < max out-degree {max_out}: "
                "a truncated transpose table drops gradients"
            )
    return coo_to_padded_csr(
        srcs, flat_pos, n_dst=n_src, k=k,
        pad_to_multiple=pad_to_multiple,
    )


def pad_rows(csr: PaddedCSR, n_dst: int) -> PaddedCSR:
    """Pad the table to ``n_dst`` rows (all-invalid rows appended)."""
    idx = np.asarray(csr.idx)
    mask = np.asarray(csr.mask)
    cur = idx.shape[0]
    if cur >= n_dst:
        return csr
    pad = ((0, n_dst - cur), (0, 0))
    return PaddedCSR(
        idx=np.pad(idx, pad), mask=np.pad(mask, pad)
    )
