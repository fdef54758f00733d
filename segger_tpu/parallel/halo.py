"""Halo-exchange sharded execution: whole-slide inference over a device
mesh without tiling truncation.

The reference predicts in bbox-expanded halo tiles on one GPU and
dedupes overlaps (reference: src/segger/data/tile_dataset.py:218-264,
writer.py:199-204).  The TPU-native equivalent (SURVEY §5.7/§5.8)
distributes the slide itself: the graph is strip-partitioned across the
mesh by x-coordinate, every device owns its nodes exactly once, and
before *each* GATv2 layer the features of boundary nodes are fetched
from their owners with ``jax.lax.ppermute`` over ICI — the graph
analogue of context-parallel ring exchange.  Per-layer refresh makes the
computation exact for any depth: no margins, no duplicate predictions,
no dedupe.

Host side: :func:`build_sharded_graph` strips the slide, builds per-shard
padded TileGraphs whose CSR indices point into the *extended* node space
``[local | halo-from-left | halo-from-right]``, and records the send
index lists.  Device side: :func:`sharded_predict_fn` wraps the ordinary
``ISTEncoder`` with an exchange callback inside ``shard_map``.
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
class HaloSpec:
    """Per-shard send lists (leading axis = shard), plus static extended
    metadata for prediction."""

    tx_send_left: jnp.ndarray        # (D, H) local tx rows -> left nbr
    tx_send_left_mask: jnp.ndarray
    tx_send_right: jnp.ndarray
    tx_send_right_mask: jnp.ndarray
    bd_send_left: jnp.ndarray        # (D, Hq)
    bd_send_left_mask: jnp.ndarray
    bd_send_right: jnp.ndarray
    bd_send_right_mask: jnp.ndarray
    bd_index_ext: jnp.ndarray        # (D, Q+2Hq) global cell encoding of
                                     # extended bd rows (-1 invalid)


def _strip_assign(x: np.ndarray, n_shards: int) -> Tuple[np.ndarray, np.ndarray]:
    """Equal-count strip partition along x; returns (shard_of_point,
    strip boundaries)."""
    qs = np.quantile(x, np.linspace(0, 1, n_shards + 1)[1:-1])
    shard = np.searchsorted(qs, x, side="right")
    return shard.astype(np.int64), qs


def build_sharded_graph(
    graph: HostGraph,
    n_shards: int,
    round_nodes: int = 128,
    round_halo: int = 32,
    for_training: bool = False,
) -> Tuple[TileGraph, HaloSpec, np.ndarray]:
    """Partition the whole-slide graph into ``n_shards`` x-strips.

    Returns (stacked per-shard TileGraph with leading axis D, HaloSpec,
    dropped-edge counts per edge type).  Edges spanning non-adjacent
    strips are dropped (counted); with equal-count strips and local
    spatial graphs this is empty in practice.

    ``for_training`` additionally equips each shard with the
    extended-space transpose tables (scatter-free backward through the
    halo exchange) and the host-precomputed triplet-sampler block
    structure, enabling whole-slide margin-free training
    (:func:`make_sharded_train_step`).

    Implementation: the 1-D strip build is exactly the ``dy == 1`` case
    of the grid build (``_build_common.build_partitioned``); this
    wrapper only chooses the strip assignment and names the x tables
    left/right.
    """
    tx_shard, qs = _strip_assign(graph.tx_pos[:, 0], n_shards)
    # bd follows its centroid, against the same strip boundaries
    bd_shard = np.searchsorted(
        qs, graph.bd_pos[:, 0], side="right"
    ).astype(np.int64)

    b = build_partitioned(
        graph, tx_shard, bd_shard, dx=n_shards, dy=1,
        round_nodes=round_nodes, round_halo=round_halo,
        for_training=for_training,
    )
    halo = HaloSpec(
        tx_send_left=b.tx_send_xl,
        tx_send_left_mask=b.tx_send_xl_mask,
        tx_send_right=b.tx_send_xr,
        tx_send_right_mask=b.tx_send_xr_mask,
        bd_send_left=b.bd_send_xl,
        bd_send_left_mask=b.bd_send_xl_mask,
        bd_send_right=b.bd_send_xr,
        bd_send_right_mask=b.bd_send_xr_mask,
        bd_index_ext=b.bd_index_ext,
    )
    return b.stacked, halo, b.dropped


# ----------------------------------------------------------------------
# device side
# ----------------------------------------------------------------------
def _exchange_1d(x, send_left, send_left_mask, send_right,
                 send_right_mask, axis: str, n_shards: int):
    """Exchange halo features with both strip neighbors.

    Non-periodic 1D exchange: unaddressed receivers get zeros from
    ppermute, and the CSR masks never reference them.

    Returns the extended source as PIECES ``(x, from_left, from_right)``
    rather than one concatenated array: the conv projects each piece
    separately (models/gatv2.py), so the large local-rows matmul carries
    no data dependency on the ppermute and XLA's latency-hiding
    scheduler overlaps the exchange with it.  Extended-space indices
    (CSR tables, transpose tables) address the concatenation
    ``[local | from_left | from_right]`` in this order.
    """
    buf_to_right = jnp.where(
        send_right_mask[:, None], x[send_right], 0.0
    )
    buf_to_left = jnp.where(send_left_mask[:, None], x[send_left], 0.0)
    from_left = jax.lax.ppermute(
        buf_to_right, axis,
        [(i, i + 1) for i in range(n_shards - 1)],
    )
    from_right = jax.lax.ppermute(
        buf_to_left, axis,
        [(i + 1, i) for i in range(n_shards - 1)],
    )
    return x, from_left, from_right


def put_sharded(tree, sharding: NamedSharding):
    """Place a host tree onto a (possibly multi-host) NamedSharding.

    ``jax.make_array_from_callback`` hands each process only its
    addressable shards, so this works on pod slices where a plain
    ``device_put`` of a host-local array to a cross-host sharding does
    not.  Single-host behavior is identical."""

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put, tree)


def fetch_global(tree):
    """np.asarray for every leaf, gathering across processes first when
    the outputs span non-addressable devices (multi-host meshes).

    ``tiled=True``: the outputs are *global* sharded arrays (the shard
    axis is already their leading dimension), so the gather must
    reassemble them in place rather than stack a new per-process axis —
    and process_allgather rejects non-fully-addressable inputs
    otherwise (covered by tests/test_multihost.py)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        tree = multihost_utils.process_allgather(tree, tiled=True)
    return jax.tree.map(np.asarray, tree)


_PREDICT_FN_CACHE: dict = {}


def make_sharded_predict(
    model,
    mesh: Mesh,
    axis: str = "data",
):
    """Build a jitted shard_map whole-slide predict function.

    Returns ``fn(params, stacked_tiles, halo) -> (tx_index, seg,
    max_sim, gene, mask)`` with leading shard axis on every output.
    ``params`` is a replicated runtime argument (not baked into the
    program as constants), and the jitted callable is cached per
    (model, mesh, axis) so repeated whole-slide predictions — e.g.
    after successive checkpoints — don't recompile.
    """
    key = (model, mesh, axis)
    hit = _PREDICT_FN_CACHE.get(key)
    if hit is not None:
        return hit
    n_shards = mesh.shape[axis]

    def device_fn(params, tile: TileGraph, halo: HaloSpec):
        # shard_map delivers (1, ...) blocks; drop/restore the axis
        tile = jax.tree.map(lambda x: x[0], tile)
        halo = jax.tree.map(lambda x: x[0], halo)

        def exchange(x_tx, x_bd):
            # only tx sources feed convs (the bd->tx conv is dormant in
            # the reference and bt tables are never built) — exchanging
            # x_bd per layer would be 2 dead ppermutes/layer
            x_tx_ext = _exchange_1d(
                x_tx, halo.tx_send_left, halo.tx_send_left_mask,
                halo.tx_send_right, halo.tx_send_right_mask,
                axis, n_shards,
            )
            return x_tx_ext, None

        emb = model.apply(
            params, tile, deterministic=True, exchange=exchange,
            pos_prenormalized=True,
        )
        # final bd exchange for candidate scoring (cand idx are extended)
        x_bd_ext = jnp.concatenate(
            _exchange_1d(
                emb["bd"], halo.bd_send_left, halo.bd_send_left_mask,
                halo.bd_send_right, halo.bd_send_right_mask,
                axis, n_shards,
            ),
            axis=0,
        )
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

    spec = P(axis)
    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    fn = jax.jit(fn)
    _PREDICT_FN_CACHE[key] = fn
    return fn


def make_sharded_train_step(
    model,
    optimizer,
    mesh: Mesh,
    tx_similarity,
    bd_similarity,
    axis: str = "data",
    tx_margin: float = 0.3,
    sg_margin: float = 0.4,
    sg_loss_type: str = "triplet",
):
    """Whole-slide margin-free training step over the device mesh.

    The reference trains on margin tiles and drops cross-tile edges
    (src/segger/data/tile_dataset.py:50-60); here the slide itself is
    strip-sharded, every layer refreshes halo features via ``ppermute``
    (exact receptive fields at any depth), and gradients flow back
    through the exchange: ``ppermute``'s VJP is the reverse permutation
    and the halo-gather's VJP scatter-adds cotangents into the owning
    shard's rows — JAX derives both, no hand-written comms backward.

    Loss semantics: every node/edge is owned by exactly one shard, so
    per-shard (sum, count) statistics ``psum`` into exact whole-slide
    masked means — identical to single-device full-graph training.  The
    only sampling-semantics difference vs a single device: triplet /
    modular-shift negatives are drawn shard-locally (the reference
    draws within a tile, lightning_model.py:177-180, so shard-local
    negatives are the faithful analogue).

    Returns ``step(params, opt_state, stacked, halo, key, weights)
    -> (params, opt_state, loss, (l_tx, l_bd, l_sg))``; params and
    optimizer state stay replicated (gradients are ``psum``-reduced
    before the update, so all shards apply the same step).
    """
    n_shards = mesh.shape[axis]
    import optax
    from ..models import losses as L

    def shard_stats(params, tile: TileGraph, halo: HaloSpec, key):
        k_drop, k_tx, k_bd, k_sg = jax.random.split(key, 4)

        def exchange(x_tx, x_bd):
            # tx only — see make_sharded_predict's exchange
            return (
                _exchange_1d(
                    x_tx, halo.tx_send_left, halo.tx_send_left_mask,
                    halo.tx_send_right, halo.tx_send_right_mask,
                    axis, n_shards,
                ),
                None,
            )

        emb = model.apply(
            params, tile, deterministic=False, rngs={"dropout": k_drop},
            exchange=exchange, pos_prenormalized=True,
        )
        # supervision srcs live in the extended space: one final tx
        # exchange exposes neighbor-shard embeddings to the link loss
        x_tx_ext = jnp.concatenate(
            _exchange_1d(
                emb["tx"], halo.tx_send_left, halo.tx_send_left_mask,
                halo.tx_send_right, halo.tx_send_right_mask,
                axis, n_shards,
            ),
            axis=0,
        )
        return L.loss_stats(
            k_tx, k_bd, k_sg, emb, tile, tx_similarity, bd_similarity,
            tx_margin=tx_margin, sg_margin=sg_margin,
            sg_loss_type=sg_loss_type, use_interior=False,
            sg_tx=x_tx_ext,
        )

    def device_fn(params, opt_state, tile, halo, key, weights):
        tile = jax.tree.map(lambda x: x[0], tile)
        halo = jax.tree.map(lambda x: x[0], halo)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def loss_fn(p):
            stats = shard_stats(p, tile, halo, key)
            # global counts are parameter-independent; stop_gradient
            # keeps the forward psum out of the backward so each shard
            # differentiates only its LOCAL numerator — a psum-in-the-
            # forward loss would seed every replica's backward with the
            # full sum and over-count gradients by the shard count
            # (psum's transpose is psum)
            tot = jax.lax.stop_gradient(jax.lax.psum(stats, axis))
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
            weights[0] * aux[0] + weights[1] * aux[1] + weights[2] * aux[2]
        )
        # each shard's grad holds only its local contribution; the
        # reduction completes the replicated whole-slide gradient
        grads = jax.lax.psum(grads, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, aux

    spec = P(axis)
    rep = P()
    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(rep, rep, spec, spec, rep, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_predict(
    model, params, graph: HostGraph, mesh: Mesh, axis: str = "data"
):
    """End-to-end: build shards, run the exchange-overlapped forward,
    gather flat prediction arrays on host."""
    n = mesh.shape[axis]
    stacked, halo, dropped = build_sharded_graph(graph, n)
    if dropped.any():
        import logging

        logging.getLogger(__name__).warning(
            "halo partition dropped %s non-adjacent-shard edges "
            "(tt, sg, cand)", dropped.tolist(),
        )
    sharding = NamedSharding(mesh, P(axis))
    stacked = put_sharded(stacked, sharding)
    halo = put_sharded(halo, sharding)
    fn = make_sharded_predict(model, mesh, axis)
    out = fn(params, stacked, halo)
    idx, seg, sim, gene, mask = fetch_global(out)
    m = mask.ravel()
    return {
        "row_index": idx.ravel()[m],
        "cell_encoding": seg.ravel()[m],
        "similarity": sim.ravel()[m],
        "gene": gene.ravel()[m],
    }
