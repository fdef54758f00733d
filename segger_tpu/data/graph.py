"""Static-shape heterogeneous tile graphs (structure-of-arrays pytrees).

The reference stores the whole-slide graph as a PyG ``HeteroData`` with two
node types and three edge types (reference: src/segger/data/utils/
heterodata.py:114-164) and slices dynamic-shape tiles from it.  On TPU every
tile batch must be a fixed-shape bucket, so segger-tpu's unit of compute is
the :class:`TileGraph`: padded node arrays + padded-CSR adjacency + validity
masks.  Stacking B tiles on a leading axis gives the training batch; that
axis is the data-parallel axis under ``jax.sharding``.

Node packing invariant: valid nodes occupy the leading rows (0..n_valid-1)
of every per-node array; padding rows follow.  Several ops rely on this
(e.g. negative sampling over boundary indices, reference:
src/segger/models/lightning_model.py:177-180).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops import PaddedCSR


@struct.dataclass
class TileGraph:
    """One spatial tile of the heterogeneous transcript/boundary graph.

    Shapes (per tile): Ntx transcripts, Nbd boundaries, padded widths K*.
    """

    # -- transcript ('tx') nodes -------------------------------------
    tx_gene: jnp.ndarray      # (Ntx,)  int32 gene encoding
    tx_pos: jnp.ndarray       # (Ntx,2) float32 spatial coordinates
    tx_cluster: jnp.ndarray   # (Ntx,)  int32 gene phenograph cluster
    tx_index: jnp.ndarray     # (Ntx,)  int32 global transcript row index
    tx_valid: jnp.ndarray     # (Ntx,)  bool  real node (not padding)
    tx_interior: jnp.ndarray  # (Ntx,)  bool  inside tile-minus-margin

    # -- boundary ('bd') nodes ---------------------------------------
    bd_x: jnp.ndarray         # (Nbd,Fbd) float32 cell embedding (PCA/morph)
    bd_pos: jnp.ndarray       # (Nbd,2)   float32 centroid
    bd_cluster: jnp.ndarray   # (Nbd,)    int32 cell phenograph cluster
    bd_index: jnp.ndarray     # (Nbd,)    int32 global cell encoding
    bd_valid: jnp.ndarray     # (Nbd,)    bool
    bd_interior: jnp.ndarray  # (Nbd,)    bool

    # -- adjacency (padded CSR, keyed by aggregation destination) ----
    tt: PaddedCSR             # tx->tx 'neighbors'   (rows: tx)
    tb: PaddedCSR             # tx->bd 'belongs'     (rows: bd)
    cand: PaddedCSR           # tx->bd 'neighbors' candidates (rows: tx,
                              #   idx entries are bd rows) — prediction only

    # -- supervision edges as padded COO (segmentation loss) ---------
    sg_src: jnp.ndarray       # (Esg,) int32 tx row
    sg_dst: jnp.ndarray       # (Esg,) int32 bd row
    sg_mask: jnp.ndarray      # (Esg,) bool

    # optional bd->tx 'contains' adjacency (rows: tx, idx are bd rows).
    # The reference defines this conv but its datasets never carry the
    # edge type, so it never runs (SURVEY Appendix); kept for generality.
    bt: Optional[PaddedCSR] = None

    # optional transpose tables (src-keyed slot positions) enabling the
    # scatter-free gather backward during training (ops.csr_gather_t);
    # prediction-only tiles omit them.
    tt_t: Optional[PaddedCSR] = None
    tb_t: Optional[PaddedCSR] = None

    # -- degree bucketing of the tt edge stage -----------------------
    # Valid tx rows are ordered low-in-degree-first at tile build
    # (data/partition.py::apply_degree_bucketing): rows [0, tt_n_lo)
    # have tt in-degree <= tt_k_lo, so the fused edge stage runs a
    # narrow-K kernel on them and the full-K kernel only on the tail —
    # with mean kNN in-degree ~k and padded width ~2-3k, this roughly
    # halves the gather rows and kernel work of the hot loop (the
    # reference gathers per-edge COO and pays no padding, at the price
    # of scatter aggregation: src/segger/models/ist_encoder.py:109-134).
    # tt_lo_t / tt_hi_t are the per-bucket transpose tables for the
    # scatter-free backward.  tt_n_lo == 0 disables bucketing.
    tt_lo_t: Optional[PaddedCSR] = None
    tt_hi_t: Optional[PaddedCSR] = None
    tt_n_lo: int = struct.field(pytree_node=False, default=0)
    tt_k_lo: int = struct.field(pytree_node=False, default=0)

    # third (extra-low) degree bucket nested inside the lo region: rows
    # [0, tt_n_xlo) additionally have in-degree <= tt_k_xlo (< tt_k_lo),
    # and the edge stage runs an even narrower kernel there — with kNN
    # max_dist truncation a large fraction of rows sit at deg <= 4, so
    # this cuts gather rows (the measured per-layer floor) again for one
    # extra kernel launch.  tt_n_xlo == 0 disables; requires tt_n_lo > 0
    # and tt_n_xlo <= tt_n_lo.  When enabled, tt_lo_t covers only the
    # middle segment rows [tt_n_xlo, tt_n_lo).
    tt_xlo_t: Optional[PaddedCSR] = None
    tt_n_xlo: int = struct.field(pytree_node=False, default=0)
    tt_k_xlo: int = struct.field(pytree_node=False, default=0)

    # True for halo-sharded tiles (parallel/halo.py): the CSR source
    # indices and the tt_t/tb_t transpose tables address the *extended*
    # node space [local | halo-from-left | halo-from-right] delivered by
    # the per-layer exchange, so the fast transpose-space backward stays
    # available during distributed training.
    transposes_extended: bool = struct.field(pytree_node=False, default=False)

    # optional host-precomputed triplet-sampler block structure (cluster
    # labels and loss masks are static per tile; computing the argsort
    # on device costs a ~16 ms while-loop per 50k nodes):
    #   *_sampler_sorted: node rows sorted by (masked) cluster
    #   *_sampler_counts: valid members per cluster (length = n clusters)
    tx_sampler_sorted: Optional[jnp.ndarray] = None
    tx_sampler_counts: Optional[jnp.ndarray] = None
    bd_sampler_sorted: Optional[jnp.ndarray] = None
    bd_sampler_counts: Optional[jnp.ndarray] = None

    @property
    def n_tx(self) -> int:
        return self.tx_gene.shape[0]

    @property
    def n_bd(self) -> int:
        return self.bd_x.shape[0]

    def n_edges(self):
        """Total valid message-passing edges (tt + tb [+ bt])."""
        e = self.tt.mask.sum() + self.tb.mask.sum()
        if self.bt is not None:
            e = e + self.bt.mask.sum()
        return e


def pad_axis(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad axis 0 of ``a`` to length ``n`` with ``fill``.

    Raises on overflow — silently truncating would drop valid
    nodes/edges and mask bucket-sizing bugs as quietly wrong output."""
    if a.shape[0] == n:
        return a
    if a.shape[0] > n:
        raise ValueError(
            f"pad_axis: array of length {a.shape[0]} exceeds target "
            f"{n} — bucket sized too small for this tile"
        )
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)
