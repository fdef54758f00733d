"""2-D grid halo-exchange sharding: whole-slide execution over a
``(dx, dy)`` device grid.

The 1-D strip sharding (``parallel/halo.py``) scales until strips grow
thin relative to the interaction radius: at D strips over a slide of
width W, halo traffic per shard is O(height) regardless of D, but the
owned strip narrows as W/D, so for slides that are large in *both*
dimensions a 2-D decomposition keeps the surface-to-volume ratio of
each shard bounded.  This module partitions the slide into a dx x dy
grid of rectangles over a 2-D ``jax.sharding.Mesh`` with axes
``("x", "y")``.

Halo features cross shard boundaries in a **two-stage relay** — first a
ppermute exchange along the x axis, then a second exchange along y that
gathers its send buffers *from the x-extended space* — so diagonal
(corner) neighbours are reached with two collectives per layer instead
of eight point-to-point sends (the standard stencil-relay trick; the
corner value travels owner -> x-neighbour -> consumer).  Extended node
space, in order::

    [ local (P) | from_x_left (H) | from_x_right (H)
                | from_y_below (Hy) | from_y_above (Hy) ]

x-stage send lists index local rows; y-stage send lists index the
x-extended prefix ``[0, P + 2H)``.  As in the 1-D module, the exchange
returns *pieces* rather than one concatenated array so the conv's large
local matmul carries no data dependency on the collectives
(models/gatv2.py projects each piece separately).

Reference behaviour analogue: bbox-expanded halo tiles + overlap dedupe
on a single GPU (reference: src/segger/data/tile_dataset.py:218-264,
src/segger/prediction/boundary.py callers); here every node is owned by
exactly one shard and the per-layer refresh makes the computation exact
at any depth — no margins, no duplicate predictions.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.assemble import HostGraph
from ..data.graph import TileGraph
from ._build_common import (
    NodePartition,
    assemble_shard_tiles,
    mk_send,
    round_up as _round_up,
    shard_csr as _shard_csr,
)


@struct.dataclass
class GridHaloSpec:
    """Per-shard send lists (leading axis = shard id ``gx*dy + gy``).

    ``*_send_xl/xr``: local row indices shipped to the left/right
    x-neighbour (stage 1).  ``*_send_yd/yu``: x-extended indices (in
    ``[0, P + 2H)``) shipped to the below/above y-neighbour (stage 2).
    ``bd_index_ext``: global cell encoding of every extended bd row
    (-1 for unused slots), used to decode candidate argmaxes.
    """

    tx_send_xl: jnp.ndarray
    tx_send_xl_mask: jnp.ndarray
    tx_send_xr: jnp.ndarray
    tx_send_xr_mask: jnp.ndarray
    tx_send_yd: jnp.ndarray
    tx_send_yd_mask: jnp.ndarray
    tx_send_yu: jnp.ndarray
    tx_send_yu_mask: jnp.ndarray
    bd_send_xl: jnp.ndarray
    bd_send_xl_mask: jnp.ndarray
    bd_send_xr: jnp.ndarray
    bd_send_xr_mask: jnp.ndarray
    bd_send_yd: jnp.ndarray
    bd_send_yd_mask: jnp.ndarray
    bd_send_yu: jnp.ndarray
    bd_send_yu_mask: jnp.ndarray
    bd_index_ext: jnp.ndarray


def _grid_assign(graph: HostGraph, dx: int, dy: int):
    """Equal-count x-quantile columns, then per-column y-quantile rows.

    bd follows its centroid through the same column/row boundaries, so
    a cell and the transcripts near it land on the same or an adjacent
    shard.
    """
    tx_x, tx_y = graph.tx_pos[:, 0], graph.tx_pos[:, 1]
    xq = (
        np.quantile(tx_x, np.linspace(0, 1, dx + 1)[1:-1])
        if dx > 1 else np.zeros(0)
    )
    tx_gx = np.searchsorted(xq, tx_x, side="right").astype(np.int64)
    bd_gx = np.searchsorted(
        xq, graph.bd_pos[:, 0], side="right"
    ).astype(np.int64)
    tx_gy = np.zeros(graph.n_tx, np.int64)
    bd_gy = np.zeros(graph.n_bd, np.int64)
    for cx in range(dx):
        m = tx_gx == cx
        ys = tx_y[m]
        yq = (
            np.quantile(ys, np.linspace(0, 1, dy + 1)[1:-1])
            if dy > 1 and ys.size else np.zeros(0)
        )
        tx_gy[m] = np.searchsorted(yq, ys, side="right")
        mb = bd_gx == cx
        bd_gy[mb] = np.searchsorted(yq, graph.bd_pos[mb, 1], side="right")
    return tx_gx * dy + tx_gy, bd_gx * dy + bd_gy


def build_grid_sharded_graph(
    graph: HostGraph,
    dx: int,
    dy: int,
    round_nodes: int = 128,
    round_halo: int = 32,
    for_training: bool = False,
) -> Tuple[TileGraph, GridHaloSpec, np.ndarray]:
    """Partition the whole-slide graph over a ``dx x dy`` grid.

    Returns (stacked per-shard TileGraph with leading axis ``dx*dy``,
    GridHaloSpec, dropped-edge counts per edge type).  Edges spanning
    shards further than one grid step in either axis are dropped
    (counted); with equal-count cells and local spatial graphs this is
    empty in practice.

    ``for_training`` additionally equips each shard with extended-space
    transpose tables (scatter-free backward through the two-stage
    exchange) and the host-precomputed triplet-sampler block structure.
    """
    D = dx * dy
    tx_shard, bd_shard = _grid_assign(graph, dx, dy)

    part = NodePartition(graph, tx_shard, bd_shard, D, round_nodes)
    tx_local, bd_local = part.tx_local, part.bd_local
    P_, Q_ = part.P, part.Q

    dropped = np.zeros(3, dtype=np.int64)

    # ------------------------------------------------------------------
    # pass 1: cross-shard requirements.  For every edge whose source
    # lives on a different shard than its consumer: stage-1 x sends for
    # any dgx != 0, and a pending y-relay record for any dgy != 0 (the
    # relay shard is (consumer_gx, owner_gy)).
    # ------------------------------------------------------------------
    xs_r_tx = [set() for _ in range(D)]
    xs_l_tx = [set() for _ in range(D)]
    xs_r_bd = [set() for _ in range(D)]
    xs_l_bd = [set() for _ in range(D)]
    pend_tx: list = []  # (g, relay_shard, dgy)
    pend_bd: list = []

    def collect(src_arr, cons_arr, shard_arr, xs_r, xs_l, pend, drop_i):
        ogx, ogy = shard_arr[src_arr] // dy, shard_arr[src_arr] % dy
        cgx, cgy = cons_arr // dy, cons_arr % dy
        ddx, ddy = cgx - ogx, cgy - ogy
        far = (np.abs(ddx) > 1) | (np.abs(ddy) > 1)
        dropped[drop_i] += int(far.sum())
        sel = ((ddx != 0) | (ddy != 0)) & ~far
        for g, dxx, dyy, cx in zip(
            src_arr[sel], ddx[sel], ddy[sel], cgx[sel]
        ):
            o = int(shard_arr[g])
            if dxx == 1:
                xs_r[o].add(g)
            elif dxx == -1:
                xs_l[o].add(g)
            if dyy != 0:
                pend.append((int(g), int(cx * dy + (o % dy)), int(dyy)))

    collect(graph.tt_src, tx_shard[graph.tt_dst], tx_shard,
            xs_r_tx, xs_l_tx, pend_tx, 0)
    collect(graph.sg_src, bd_shard[graph.sg_dst], tx_shard,
            xs_r_tx, xs_l_tx, pend_tx, 1)
    collect(graph.cand_dst, tx_shard[graph.cand_src], bd_shard,
            xs_r_bd, xs_l_bd, pend_bd, 2)

    H = _round_up(
        max([1] + [len(s) for s in xs_r_tx] + [len(s) for s in xs_l_tx]),
        round_halo,
    )
    Hq = _round_up(
        max([1] + [len(s) for s in xs_r_bd] + [len(s) for s in xs_l_bd]),
        round_halo,
    )

    sr_tx_i, sr_tx_m, sr_tx_s = mk_send(xs_r_tx, D, H, tx_local)
    sl_tx_i, sl_tx_m, sl_tx_s = mk_send(xs_l_tx, D, H, tx_local)
    sr_bd_i, sr_bd_m, sr_bd_s = mk_send(xs_r_bd, D, Hq, bd_local)
    sl_bd_i, sl_bd_m, sl_bd_s = mk_send(xs_l_bd, D, Hq, bd_local)

    # x-extended index of source g at a shard r in the owner's grid row
    # (r's gy == owner's gy, |r_gx - owner_gx| <= 1)
    def xext(g, r, shard_arr, local_map, P_n, Hn, sr_s, sl_s):
        o = int(shard_arr[g])
        if o == r:
            return int(local_map[g])
        if r // dy == o // dy + 1:
            return P_n + sr_s[o][g]
        if r // dy == o // dy - 1:
            return P_n + Hn + sl_s[o][g]
        return -1

    def xext_tx(g, r):
        return xext(g, r, tx_shard, tx_local, P_, H, sr_tx_s, sl_tx_s)

    def xext_bd(g, r):
        return xext(g, r, bd_shard, bd_local, Q_, Hq, sr_bd_s, sl_bd_s)

    # ------------------------------------------------------------------
    # pass 2: y-stage send sets.  Entries are x-extended indices at the
    # relay shard; the dict also remembers which global node each
    # x-extended slot carries (needed to decode bd_index_ext).
    # ------------------------------------------------------------------
    ys_u_tx = [dict() for _ in range(D)]  # xext -> global g
    ys_d_tx = [dict() for _ in range(D)]
    ys_u_bd = [dict() for _ in range(D)]
    ys_d_bd = [dict() for _ in range(D)]

    for g, r, dyy in pend_tx:
        xe = xext_tx(g, r)
        (ys_u_tx if dyy == 1 else ys_d_tx)[r][xe] = g
    for g, r, dyy in pend_bd:
        xe = xext_bd(g, r)
        (ys_u_bd if dyy == 1 else ys_d_bd)[r][xe] = g

    Hy = _round_up(
        max([1] + [len(s) for s in ys_u_tx] + [len(s) for s in ys_d_tx]),
        round_halo,
    )
    Hqy = _round_up(
        max([1] + [len(s) for s in ys_u_bd] + [len(s) for s in ys_d_bd]),
        round_halo,
    )

    def mk_ysend(send_dicts, width):
        idx = np.zeros((D, width), np.int32)
        mask = np.zeros((D, width), bool)
        slot_of = [dict() for _ in range(D)]
        for d in range(D):
            for j, xe in enumerate(sorted(send_dicts[d])):
                idx[d, j] = xe
                mask[d, j] = True
                slot_of[d][xe] = j
        return idx, mask, slot_of

    yu_tx_i, yu_tx_m, yu_tx_s = mk_ysend(ys_u_tx, Hy)
    yd_tx_i, yd_tx_m, yd_tx_s = mk_ysend(ys_d_tx, Hy)
    yu_bd_i, yu_bd_m, yu_bd_s = mk_ysend(ys_u_bd, Hqy)
    yd_bd_i, yd_bd_m, yd_bd_s = mk_ysend(ys_d_bd, Hqy)

    # full extended index of source g as seen from consumer shard c
    def mk_ext(shard_arr, xext_fn, P_n, Hn, Hyn, yu_s, yd_s):
        def ext(g, c):
            o = int(shard_arr[g])
            ogx, ogy = divmod(o, dy)
            cgx, cgy = divmod(c, dy)
            dxx, dyy = cgx - ogx, cgy - ogy
            if abs(dxx) > 1 or abs(dyy) > 1:
                return -1
            if dyy == 0:
                return xext_fn(g, c)
            r = cgx * dy + ogy
            xe = xext_fn(g, r)
            if dyy == 1:   # relay sends up; consumer's from-below buffer
                return P_n + 2 * Hn + yu_s[r][xe]
            return P_n + 2 * Hn + Hyn + yd_s[r][xe]
        return ext

    ext_tx = mk_ext(tx_shard, xext_tx, P_, H, Hy, yu_tx_s, yd_tx_s)
    ext_bd = mk_ext(bd_shard, xext_bd, Q_, Hq, Hqy, yu_bd_s, yd_bd_s)

    # per-shard CSR tables in extended index space
    tt_tables = _shard_csr(
        D, graph.tt_dst, graph.tt_src, tx_shard, tx_local, P_,
        tx_shard, tx_local, ext_tx,
    )
    tb_tables = _shard_csr(
        D, graph.sg_dst, graph.sg_src, bd_shard, bd_local, Q_,
        tx_shard, tx_local, ext_tx, k_round=8,
    )
    cand_tables = _shard_csr(
        D, graph.cand_src, graph.cand_dst, tx_shard, tx_local, P_,
        bd_shard, bd_local, ext_bd,
    )

    tiles = assemble_shard_tiles(
        graph, part, ext_tx, tt_tables, tb_tables, cand_tables,
        for_training, n_src_ext=P_ + 2 * H + 2 * Hy,
    )

    # decode table for extended bd rows
    bd_index_ext = np.full((D, Q_ + 2 * Hq + 2 * Hqy), -1, np.int64)
    for d in range(D):
        nbd = part.bd_rows[d].size
        bd_index_ext[d, :nbd] = graph.bd_index[part.bd_rows[d]]
        gx_, gy_ = divmod(d, dy)
        if gx_ - 1 >= 0:
            for g, j in sr_bd_s[(gx_ - 1) * dy + gy_].items():
                bd_index_ext[d, Q_ + j] = graph.bd_index[g]
        if gx_ + 1 < dx:
            for g, j in sl_bd_s[(gx_ + 1) * dy + gy_].items():
                bd_index_ext[d, Q_ + Hq + j] = graph.bd_index[g]
        if gy_ - 1 >= 0:
            r = gx_ * dy + (gy_ - 1)
            for xe, j in yu_bd_s[r].items():
                bd_index_ext[d, Q_ + 2 * Hq + j] = \
                    graph.bd_index[ys_u_bd[r][xe]]
        if gy_ + 1 < dy:
            r = gx_ * dy + (gy_ + 1)
            for xe, j in yd_bd_s[r].items():
                bd_index_ext[d, Q_ + 2 * Hq + Hqy + j] = \
                    graph.bd_index[ys_d_bd[r][xe]]

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *tiles)
    halo = GridHaloSpec(
        tx_send_xl=sl_tx_i, tx_send_xl_mask=sl_tx_m,
        tx_send_xr=sr_tx_i, tx_send_xr_mask=sr_tx_m,
        tx_send_yd=yd_tx_i, tx_send_yd_mask=yd_tx_m,
        tx_send_yu=yu_tx_i, tx_send_yu_mask=yu_tx_m,
        bd_send_xl=sl_bd_i, bd_send_xl_mask=sl_bd_m,
        bd_send_xr=sr_bd_i, bd_send_xr_mask=sr_bd_m,
        bd_send_yd=yd_bd_i, bd_send_yd_mask=yd_bd_m,
        bd_send_yu=yu_bd_i, bd_send_yu_mask=yu_bd_m,
        bd_index_ext=bd_index_ext,
    )
    return stacked, halo, dropped


# ----------------------------------------------------------------------
# device side
# ----------------------------------------------------------------------
def _exchange_2d(x, s_xl, s_xl_m, s_xr, s_xr_m, s_yd, s_yd_m,
                 s_yu, s_yu_m, ax: str, ay: str, dx: int, dy: int):
    """Two-stage relay exchange.  Returns the extended source as PIECES
    ``(local, from_xl, from_xr, from_yd, from_yu)`` — the conv projects
    each piece separately so the local matmul overlaps the collectives
    (models/gatv2.py).  Stage-2 send buffers gather from the x-extended
    space piecewise (local rows from ``x``, halo rows from the stage-1
    results) without materializing the concatenation.
    """
    P_n = x.shape[0]
    buf_r = jnp.where(s_xr_m[:, None], x[s_xr], 0.0)
    buf_l = jnp.where(s_xl_m[:, None], x[s_xl], 0.0)
    from_xl = jax.lax.ppermute(
        buf_r, ax, [(i, i + 1) for i in range(dx - 1)]
    )
    from_xr = jax.lax.ppermute(
        buf_l, ax, [(i + 1, i) for i in range(dx - 1)]
    )
    xhalo = jnp.concatenate([from_xl, from_xr], axis=0)  # (2H, F) small

    def pick(idx, m):
        loc = x[jnp.clip(idx, 0, P_n - 1)]
        hal = xhalo[jnp.clip(idx - P_n, 0, xhalo.shape[0] - 1)]
        v = jnp.where((idx < P_n)[:, None], loc, hal)
        return jnp.where(m[:, None], v, 0.0)

    from_yd = jax.lax.ppermute(
        pick(s_yu, s_yu_m), ay, [(i, i + 1) for i in range(dy - 1)]
    )
    from_yu = jax.lax.ppermute(
        pick(s_yd, s_yd_m), ay, [(i + 1, i) for i in range(dy - 1)]
    )
    return x, from_xl, from_xr, from_yd, from_yu


def _tx_exchange(h: GridHaloSpec, ax, ay, dx, dy):
    def ex(x):
        return _exchange_2d(
            x, h.tx_send_xl, h.tx_send_xl_mask,
            h.tx_send_xr, h.tx_send_xr_mask,
            h.tx_send_yd, h.tx_send_yd_mask,
            h.tx_send_yu, h.tx_send_yu_mask, ax, ay, dx, dy,
        )
    return ex


def _bd_exchange(h: GridHaloSpec, ax, ay, dx, dy):
    def ex(x):
        return _exchange_2d(
            x, h.bd_send_xl, h.bd_send_xl_mask,
            h.bd_send_xr, h.bd_send_xr_mask,
            h.bd_send_yd, h.bd_send_yd_mask,
            h.bd_send_yu, h.bd_send_yu_mask, ax, ay, dx, dy,
        )
    return ex


def make_grid_mesh(dx: int, dy: int, devices=None) -> Mesh:
    """``(dx, dy)`` mesh with axes ``("x", "y")``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(
        np.array(devices[: dx * dy]).reshape(dx, dy), ("x", "y")
    )


_GRID_PREDICT_FN_CACHE: dict = {}


def make_grid_predict(model, mesh: Mesh,
                      ax: str = "x", ay: str = "y"):
    """Jitted shard_map whole-slide predict over the 2-D grid; mirrors
    halo.py::make_sharded_predict (params as a replicated runtime
    argument, per-(model, mesh) jit cache) with the two-stage
    exchange."""
    key = (model, mesh, ax, ay)
    hit = _GRID_PREDICT_FN_CACHE.get(key)
    if hit is not None:
        return hit
    dx, dy = mesh.shape[ax], mesh.shape[ay]

    def device_fn(params, tile: TileGraph, halo: GridHaloSpec):
        tile = jax.tree.map(lambda x: x[0], tile)
        halo = jax.tree.map(lambda x: x[0], halo)
        ex_tx = _tx_exchange(halo, ax, ay, dx, dy)
        ex_bd = _bd_exchange(halo, ax, ay, dx, dy)

        emb = model.apply(
            params, tile, deterministic=True,
            exchange=lambda x_tx, x_bd: (ex_tx(x_tx), None),
            pos_prenormalized=True,
        )
        x_bd_ext = jnp.concatenate(ex_bd(emb["bd"]), axis=0)
        from ..ops import score_candidates

        max_sim, seg = score_candidates(
            emb["tx"], x_bd_ext, tile.cand, halo.bd_index_ext
        )
        return jax.tree.map(
            lambda x: x[None],
            (tile.tx_index, seg, max_sim, tile.tx_gene, tile.tx_valid),
        )

    spec = P((ax, ay))
    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    fn = jax.jit(fn)
    _GRID_PREDICT_FN_CACHE[key] = fn
    return fn


def make_grid_train_step(
    model,
    optimizer,
    mesh: Mesh,
    tx_similarity,
    bd_similarity,
    ax: str = "x",
    ay: str = "y",
    tx_margin: float = 0.3,
    sg_margin: float = 0.4,
    sg_loss_type: str = "triplet",
):
    """Whole-slide margin-free training step over the 2-D grid; the
    1-D semantics (halo.py::make_sharded_train_step — local numerators
    over stopped global counts, psum'd grads) carry over with psums
    spanning both mesh axes."""
    dx, dy = mesh.shape[ax], mesh.shape[ay]
    axes = (ax, ay)
    import optax
    from ..models import losses as L

    def shard_stats(params, tile: TileGraph, halo: GridHaloSpec, key):
        k_drop, k_tx, k_bd, k_sg = jax.random.split(key, 4)
        ex_tx = _tx_exchange(halo, ax, ay, dx, dy)
        ex_bd = _bd_exchange(halo, ax, ay, dx, dy)

        emb = model.apply(
            params, tile, deterministic=False, rngs={"dropout": k_drop},
            exchange=lambda x_tx, x_bd: (ex_tx(x_tx), None),
            pos_prenormalized=True,
        )
        # supervision srcs live in extended index space
        x_tx_ext = jnp.concatenate(ex_tx(emb["tx"]), axis=0)
        return L.loss_stats(
            k_tx, k_bd, k_sg, emb, tile, tx_similarity, bd_similarity,
            tx_margin=tx_margin, sg_margin=sg_margin,
            sg_loss_type=sg_loss_type, use_interior=False,
            sg_tx=x_tx_ext,
        )

    def device_fn(params, opt_state, tile, halo, key, weights):
        tile = jax.tree.map(lambda x: x[0], tile)
        halo = jax.tree.map(lambda x: x[0], halo)
        shard_id = jax.lax.axis_index(ax) * dy + jax.lax.axis_index(ay)
        key = jax.random.fold_in(key, shard_id)

        def loss_fn(p):
            stats = shard_stats(p, tile, halo, key)
            # see halo.py: differentiate only the LOCAL numerator over
            # stopped global counts (psum's transpose is psum)
            tot = jax.lax.stop_gradient(jax.lax.psum(stats, axes))
            c_tx = jnp.maximum(tot[1], 1.0)
            c_bd = jnp.maximum(tot[3], 1.0)
            c_sg = jnp.maximum(tot[5], 1.0)
            local = (
                weights[0] * stats[0] / c_tx
                + weights[1] * stats[2] / c_bd
                + weights[2] * stats[4] / c_sg
            )
            aux = (tot[0] / c_tx, tot[2] / c_bd, tot[4] / c_sg)
            return local, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        loss = (
            weights[0] * aux[0] + weights[1] * aux[1]
            + weights[2] * aux[2]
        )
        grads = jax.lax.psum(grads, axes)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    spec = P((ax, ay))
    rep = P()
    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(rep, rep, spec, spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(fn)


def grid_predict(
    model, params, graph: HostGraph, mesh: Mesh,
    ax: str = "x", ay: str = "y",
):
    """End-to-end 2-D sharded whole-slide prediction."""
    dx, dy = mesh.shape[ax], mesh.shape[ay]
    stacked, halo, dropped = build_grid_sharded_graph(graph, dx, dy)
    if dropped.any():
        import logging

        logging.getLogger(__name__).warning(
            "grid partition dropped %s far-shard edges (tt, sg, cand)",
            dropped.tolist(),
        )
    from .halo import fetch_global, put_sharded

    sharding = NamedSharding(mesh, P((ax, ay)))
    stacked = put_sharded(stacked, sharding)
    halo = put_sharded(halo, sharding)
    fn = make_grid_predict(model, mesh, ax, ay)
    idx, seg, sim, gene, mask = fetch_global(fn(params, stacked, halo))
    m = mask.ravel()
    return {
        "row_index": idx.ravel()[m],
        "cell_encoding": seg.ravel()[m],
        "similarity": sim.ravel()[m],
        "gene": gene.ravel()[m],
    }
