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
from ._build_common import build_partitioned


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

    Implementation: all build machinery is shared with the 1-D strip
    builder (``_build_common.build_partitioned``; 1-D is the ``dy == 1``
    case).  This wrapper only chooses the grid assignment and names the
    tables.
    """
    tx_shard, bd_shard = _grid_assign(graph, dx, dy)
    b = build_partitioned(
        graph, tx_shard, bd_shard, dx=dx, dy=dy,
        round_nodes=round_nodes, round_halo=round_halo,
        for_training=for_training,
    )
    halo = GridHaloSpec(
        tx_send_xl=b.tx_send_xl, tx_send_xl_mask=b.tx_send_xl_mask,
        tx_send_xr=b.tx_send_xr, tx_send_xr_mask=b.tx_send_xr_mask,
        tx_send_yd=b.tx_send_yd, tx_send_yd_mask=b.tx_send_yd_mask,
        tx_send_yu=b.tx_send_yu, tx_send_yu_mask=b.tx_send_yu_mask,
        bd_send_xl=b.bd_send_xl, bd_send_xl_mask=b.bd_send_xl_mask,
        bd_send_xr=b.bd_send_xr, bd_send_xr_mask=b.bd_send_xr_mask,
        bd_send_yd=b.bd_send_yd, bd_send_yd_mask=b.bd_send_yd_mask,
        bd_send_yu=b.bd_send_yu, bd_send_yu_mask=b.bd_send_yu_mask,
        bd_index_ext=b.bd_index_ext,
    )
    return b.stacked, halo, b.dropped


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
            emb["tx"], x_bd_ext, tile.cand, halo.bd_index_ext,
            # same fast path as the tiled trainer: the encoder already
            # emits unit vectors when normalize_embeddings is set
            normalized=model.normalize_embeddings,
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
