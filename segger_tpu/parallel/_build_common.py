"""Shared host-side machinery for the halo-sharded graph builders.

``parallel/halo.py`` (1-D strips) and ``parallel/grid.py`` (2-D grid
with two-stage relay) differ only in how they *assign* nodes to shards
and how they enumerate/route cross-shard sources; everything downstream
— send-list tables, extended-space CSR construction, extended transpose
tables for training, and per-shard TileGraph assembly — is identical
and lives here.  (Reference behaviour analogue: bbox-expanded halo
tiles + overlap dedupe, src/segger/data/tile_dataset.py:218-264; here
every node is owned by exactly once and halos are exchanged per layer.)
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from ..data.assemble import HostGraph
from ..data.graph import TileGraph
from ..ops.padded_csr import PaddedCSR, coo_to_padded_csr, transpose_csr


def round_up(x, m):
    return max(m, -(-int(x) // m) * m)


def padn(a: np.ndarray, n: int, fill=0) -> np.ndarray:
    pad = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad, constant_values=fill)


class NodePartition:
    """Per-shard row lists, padded sizes, and global->local index maps
    for both node types, plus the global positional-normalization frame.
    """

    def __init__(self, graph: HostGraph, tx_shard: np.ndarray,
                 bd_shard: np.ndarray, n_shards: int, round_nodes: int):
        self.D = n_shards
        self.tx_shard, self.bd_shard = tx_shard, bd_shard
        self.tx_rows = [np.where(tx_shard == d)[0] for d in range(n_shards)]
        self.bd_rows = [np.where(bd_shard == d)[0] for d in range(n_shards)]
        self.P = round_up(max(r.size for r in self.tx_rows), round_nodes)
        self.Q = round_up(
            max(max(r.size for r in self.bd_rows), 1), round_nodes
        )
        self.tx_local = np.full(graph.n_tx, -1, np.int64)
        self.bd_local = np.full(graph.n_bd, -1, np.int64)
        for d in range(n_shards):
            self.tx_local[self.tx_rows[d]] = np.arange(self.tx_rows[d].size)
            self.bd_local[self.bd_rows[d]] = np.arange(self.bd_rows[d].size)
        lo = np.vstack([graph.tx_pos, graph.bd_pos]).min(axis=0)
        hi = np.vstack([graph.tx_pos, graph.bd_pos]).max(axis=0)
        self.pos_lo, self.pos_scale = lo, (hi - lo) + 1e-8


def mk_send(send_sets: Sequence[set], n_shards: int, width: int,
            local_map: np.ndarray):
    """Ordered send lists + per-shard global-id -> slot maps."""
    idx = np.zeros((n_shards, width), np.int32)
    mask = np.zeros((n_shards, width), bool)
    slot_of: List[Dict[int, int]] = [dict() for _ in range(n_shards)]
    for d in range(n_shards):
        ordered = np.sort(np.fromiter(send_sets[d], dtype=np.int64))
        for j, g in enumerate(ordered):
            idx[d, j] = local_map[g]
            mask[d, j] = True
            slot_of[d][g] = j
    return idx, mask, slot_of


def ext_many(src_global: np.ndarray, d: int, src_shard_arr: np.ndarray,
             src_local_map: np.ndarray, ext_fn: Callable[[int, int], int]
             ) -> np.ndarray:
    """Vectorized extended-index lookup: same-shard sources (the
    overwhelming majority) resolve by local map; Python only runs on
    the cross-shard boundary tail."""
    out = np.empty(src_global.size, np.int64)
    same = src_shard_arr[src_global] == d
    out[same] = src_local_map[src_global[same]]
    for i in np.where(~same)[0]:
        out[i] = ext_fn(int(src_global[i]), d)
    return out


def shard_csr(n_shards: int, dst_rows_global, src_global, dst_shard_arr,
              dst_local_map, n_rows, src_shard_arr, src_local_map,
              ext_fn, k_round: int = 4) -> List[PaddedCSR]:
    """Per-shard padded CSR tables: rows in the dst shard's local space,
    entries in its extended source space (``ext_fn`` maps global ->
    extended or -1 = unreachable)."""
    tables = []
    for d in range(n_shards):
        sel = dst_shard_arr[dst_rows_global] == d
        dsts = dst_local_map[dst_rows_global[sel]]
        srcs = ext_many(src_global[sel], d, src_shard_arr,
                        src_local_map, ext_fn)
        keep = srcs >= 0
        tables.append((dsts[keep], srcs[keep]))
    kmax = 1
    for dsts, _ in tables:
        if dsts.size:
            kmax = max(kmax, int(np.bincount(dsts).max()))
    kmax = round_up(kmax, k_round)
    return [
        coo_to_padded_csr(d_, s_, n_dst=n_rows, k=kmax)
        for d_, s_ in tables
    ]


def ext_transposes(tables: Sequence[PaddedCSR],
                   n_src_ext: int) -> List[PaddedCSR]:
    """Extended-space transpose tables: one shared column width so the
    stacked shard tensors agree, sized to the densest source row."""
    width = 4
    for t in tables:
        srcs = np.asarray(t.idx)[np.asarray(t.mask)]
        if srcs.size:
            width = max(width, round_up(
                int(np.bincount(srcs, minlength=n_src_ext).max()), 4,
            ))
    return [transpose_csr(t, n_src=n_src_ext, k=width) for t in tables]


def sg_capacity(graph: HostGraph, bd_shard: np.ndarray,
                n_shards: int) -> int:
    return round_up(
        max([1] + [int((bd_shard[graph.sg_dst] == d).sum())
                   for d in range(n_shards)]),
        256,
    )


def assemble_shard_tiles(
    graph: HostGraph,
    part: NodePartition,
    ext_tx: Callable[[int, int], int],
    tt_tables, tb_tables, cand_tables,
    for_training: bool,
    n_src_ext: int,
) -> List[TileGraph]:
    """Per-shard padded TileGraphs (positions pre-normalized to the
    global frame; training shards additionally carry extended transpose
    tables and the host-precomputed triplet-sampler block structure)."""
    E_sg = sg_capacity(graph, part.bd_shard, part.D)
    tt_t_tables = tb_t_tables = None
    if for_training:
        tt_t_tables = ext_transposes(tt_tables, n_src_ext)
        tb_t_tables = ext_transposes(tb_tables, n_src_ext)

    tiles = []
    for d in range(part.D):
        txr, bdr = part.tx_rows[d], part.bd_rows[d]
        ntx, nbd = txr.size, bdr.size
        sel = part.bd_shard[graph.sg_dst] == d
        sgs = ext_many(graph.sg_src[sel], d, part.tx_shard,
                       part.tx_local, ext_tx)
        sgd = part.bd_local[graph.sg_dst[sel]]
        keep = sgs >= 0
        sgs, sgd = sgs[keep], sgd[keep]
        n_sg = min(sgs.size, E_sg)

        pos_tx = (graph.tx_pos[txr] - part.pos_lo) / part.pos_scale
        pos_bd = (graph.bd_pos[bdr] - part.pos_lo) / part.pos_scale

        extra = {}
        if for_training:
            from ..data.partition import _sampler_structure

            tx_ss, tx_sc = _sampler_structure(
                padn(graph.tx_cluster[txr], part.P, -1),
                np.ones(ntx, bool), ntx, part.P,
                graph.tx_similarity.shape[0],
            )
            bd_ss, bd_sc = _sampler_structure(
                padn(graph.bd_cluster[bdr], part.Q, -1),
                np.ones(nbd, bool), nbd, part.Q,
                graph.bd_similarity.shape[0],
            )
            extra = dict(
                tt_t=tt_t_tables[d],
                tb_t=tb_t_tables[d],
                transposes_extended=True,
                tx_sampler_sorted=tx_ss,
                tx_sampler_counts=tx_sc,
                bd_sampler_sorted=bd_ss,
                bd_sampler_counts=bd_sc,
            )

        tiles.append(
            TileGraph(
                tx_gene=padn(graph.tx_gene[txr], part.P),
                tx_pos=padn(pos_tx.astype(np.float32), part.P),
                tx_cluster=padn(graph.tx_cluster[txr], part.P, -1),
                tx_index=padn(
                    graph.tx_index[txr].astype(np.int32), part.P, -1
                ),
                tx_valid=padn(np.ones(ntx, bool), part.P),
                tx_interior=padn(np.ones(ntx, bool), part.P),
                bd_x=padn(graph.bd_x[bdr], part.Q),
                bd_pos=padn(pos_bd.astype(np.float32), part.Q),
                bd_cluster=padn(graph.bd_cluster[bdr], part.Q, -1),
                bd_index=padn(
                    graph.bd_index[bdr].astype(np.int32), part.Q, -1
                ),
                bd_valid=padn(np.ones(nbd, bool), part.Q),
                bd_interior=padn(np.ones(nbd, bool), part.Q),
                tt=tt_tables[d],
                tb=tb_tables[d],
                cand=cand_tables[d],
                sg_src=padn(sgs[:n_sg].astype(np.int32), E_sg),
                sg_dst=padn(sgd[:n_sg].astype(np.int32), E_sg),
                sg_mask=padn(np.ones(n_sg, bool), E_sg),
                **extra,
            )
        )
    return tiles
