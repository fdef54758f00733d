"""Training losses: cluster-CDF triplet sampling, triplet/metric losses,
and the segmentation link loss.

Semantics match the reference:
  - ``FastTripletSelector`` inverse-CDF cluster sampling
    (src/segger/models/triplet_loss.py:27-125)
  - ``TripletLoss`` = margin triplet on sampled triplets (:128-160)
  - ``MetricLoss`` = MSE of anchor/pos/neg cosine similarity against
    cluster-similarity targets (:163-204)
  - segmentation loss with modular-shift negatives, triplet or BCE
    (src/segger/models/lightning_model.py:167-207)

All functions are fixed-shape and fully vectorized: cluster CDFs are
(N, C) cumsums + comparisons (C is small), member lookup is an argsort-
based block index — no Python loops, jit/vmap-safe, mask-aware.  Losses
return ``(sum, count)`` pairs so stacked tiles can be combined into the
exact joint masked mean the reference computes over a multi-tile batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp



class TripletSample(NamedTuple):
    positives: jnp.ndarray   # (N,) int32 anchor indices of positives
    negatives: jnp.ndarray   # (N,) int32
    dists_pos: jnp.ndarray   # (N,) float32: 1 - sim(cluster_a, cluster_p)
    dists_neg: jnp.ndarray   # (N,) float32
    ok: jnp.ndarray          # (N,) bool — anchor had a valid sample


from ..ops.gather_agg import row_gather_1d as _row_gather_1d


def prepare_similarity(similarity: jnp.ndarray) -> jnp.ndarray:
    """Fill diagonal with 1 and clamp to the reference's minimum sampling
    probability (triplet_loss.py:21-24)."""
    c = similarity.shape[0]
    eye = jnp.eye(c, dtype=bool)
    sim = jnp.where(eye, 1.0, similarity)
    return sim


def sample_triplets(
    rng: jax.Array,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    similarity: jnp.ndarray,
    sort_structure: "tuple[jnp.ndarray, jnp.ndarray] | None" = None,
) -> TripletSample:
    """Sample one positive and one negative per anchor.

    Positive/negative *clusters* are drawn by inverse-CDF over the
    (dis)similarity row of the anchor's cluster, restricted to clusters
    present among valid nodes; members are drawn uniformly within the
    cluster (triplet_loss.py:82-114).

    Parameters
    ----------
    labels : (N,) int32 cluster ids in [0, C); ignored where ``~valid``.
    valid : (N,) bool anchor mask.
    similarity : (C, C) float cluster-cosine-similarity (raw; diagonal
        filled internally).
    """
    eps = 1e-8
    n = labels.shape[0]
    c = similarity.shape[0]
    sim = prepare_similarity(similarity)
    sim_p = jnp.clip(sim, eps, None)           # positive sampling weights
    dis_p = jnp.clip(-sim, eps, None)          # negative sampling weights

    lab = jnp.where(valid, labels, 0).astype(jnp.int32)

    if sort_structure is not None:
        # host-precomputed per-tile block layout (labels and masks are
        # static per tile; a 50k-element argsort lowers to a ~16 ms
        # while loop on TPU — see docs/design.md)
        sorted_idx, counts = sort_structure
        counts = counts.astype(jnp.int32)
    else:
        # cluster occupancy among valid nodes
        counts = jax.ops.segment_sum(
            valid.astype(jnp.int32), lab, num_segments=c
        )
        # block layout of members: argsort by (label, padded-last)
        sort_key = jnp.where(valid, lab, c)
        sorted_idx = jnp.argsort(sort_key)
    present = counts > 0
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )

    k_pos, k_neg, k_mem_p, k_mem_n = jax.random.split(rng, 4)

    # inclusive prefix-sum as ONE MXU matmul: XLA lowers a (N, C)
    # cumsum to reduce-window plus two layout copies (~0.6 ms/step at
    # bench scale); w @ U with U[i, j] = [i <= j] is exact-enough and
    # stays on the matrix unit
    cum_u = jnp.triu(jnp.ones((c, c), jnp.float32))

    def draw(weight_matrix, key_cluster, key_member):
        # (N, C) row of sampling weights for each anchor, masked to
        # present clusters
        w = weight_matrix[lab] * present[None, :].astype(weight_matrix.dtype)
        tot = w.sum(axis=1, keepdims=True)
        cdf = jnp.dot(
            w, cum_u, preferred_element_type=jnp.float32
        ) / jnp.maximum(tot, 1e-30)
        u = jax.random.uniform(key_cluster, (n, 1))
        cl = jnp.sum(cdf < u, axis=1).astype(jnp.int32)
        cl = jnp.clip(cl, 0, c - 1)
        size = counts[cl]
        u2 = jax.random.uniform(key_member, (n,))
        j = jnp.floor(u2 * size.astype(jnp.float32)).astype(jnp.int32)
        j = jnp.clip(j, 0, jnp.maximum(size - 1, 0))
        # The member lookup is a 50k-element SCALAR gather — XLA lowers
        # 1-D s32 gathers to ~0.33 ms per draw at 50k anchors on TPU
        # (2x the rest of the triplet loss combined; r4 xplane trace,
        # tools/trace_loss.py).  Reshape the table to 128-lane rows so
        # the lookup becomes a fast ROW gather plus an in-row one-hot
        # select; the barrier keeps the gather out of the surrounding
        # loop fusion.
        pos = offsets[cl] + j
        member = _row_gather_1d(sorted_idx, pos)
        ok = (tot[:, 0] > 0) & (size > 0)
        return member.astype(jnp.int32), cl, ok

    positives, pos_cl, ok_p = draw(sim_p, k_pos, k_mem_p)
    negatives, neg_cl, ok_n = draw(dis_p, k_neg, k_mem_n)

    # distances from the *clamped+filled* similarity (triplet_loss.py:116-118).
    # The sampler guarantees lab[positives] == pos_cl (members are drawn
    # from cluster-sorted blocks), so the cluster lookup uses the drawn
    # cluster ids directly — no per-anchor member-label gathers.
    dists = 1.0 - jnp.clip(sim, eps, None)
    d_pos = dists[lab, pos_cl]
    d_neg = dists[lab, neg_cl]

    ok = valid & ok_p & ok_n
    return TripletSample(positives, negatives, d_pos, d_neg, ok)


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray):
    s = jnp.where(mask, values, 0.0).sum()
    cnt = mask.sum()
    return s, cnt


def triplet_loss(
    rng: jax.Array,
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    similarity: jnp.ndarray,
    margin: float = 0.3,
    sort_structure=None,
):
    """Margin triplet loss on sampled triplets (TripletMarginLoss p=2,
    reference defaults tx_margin=0.3, lightning_model.py:37,109-112).

    Returns (sum, count) for exact cross-tile joint means.
    """
    s = sample_triplets(rng, labels, valid, similarity, sort_structure)
    a = embeddings
    p = embeddings[s.positives]
    ng = embeddings[s.negatives]
    dp = jnp.sqrt(jnp.sum((a - p) ** 2, axis=-1) + 1e-12)
    dn = jnp.sqrt(jnp.sum((a - ng) ** 2, axis=-1) + 1e-12)
    per = jnp.maximum(dp - dn + margin, 0.0)
    return _masked_mean(per, s.ok)


def metric_loss(
    rng: jax.Array,
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray,
    similarity: jnp.ndarray,
    sort_structure=None,
):
    """MSE of anchor-positive / anchor-negative cosine similarity against
    cluster-similarity targets (triplet_loss.py:176-204).

    Returns (sum_pos + sum_neg, count) so that sum/count equals the
    reference's mse(pos) + mse(neg) when a single tile is used.
    """
    s = sample_triplets(rng, labels, valid, similarity, sort_structure)
    a = embeddings
    p = embeddings[s.positives]
    ng = embeddings[s.negatives]

    def cos(u, v):
        # NaN-safe at zero vectors (clamped-sqrt denominators)
        nu = jnp.sqrt(jnp.maximum((u * u).sum(-1), 1e-16))
        nv = jnp.sqrt(jnp.maximum((v * v).sum(-1), 1e-16))
        return (u * v).sum(-1) / (nu * nv)

    se_pos = (cos(a, p) - (1.0 - s.dists_pos)) ** 2
    se_neg = (cos(a, ng) - (1.0 - s.dists_neg)) ** 2
    sum_p, cnt = _masked_mean(se_pos, s.ok)
    sum_n, _ = _masked_mean(se_neg, s.ok)
    return sum_p + sum_n, cnt


def segmentation_loss(
    rng: jax.Array,
    emb_tx: jnp.ndarray,
    emb_bd: jnp.ndarray,
    sg_src: jnp.ndarray,
    sg_dst: jnp.ndarray,
    sg_mask: jnp.ndarray,
    n_bd_valid: jnp.ndarray,
    loss_type: str = "triplet",
    margin: float = 0.4,
):
    """Segmentation link loss over supervision edges.

    Negatives are the reference's modular shift
    ``(dst + randint(1, num_bd)) % num_bd`` (lightning_model.py:177-180);
    valid boundary nodes must occupy rows [0, n_bd_valid).  When
    ``n_bd_valid <= 1`` the loss contributes 0 (lightning_model.py:173-175).

    Returns (sum, count).
    """
    e = sg_src.shape[0]
    nb = jnp.maximum(n_bd_valid, 2)
    shift = jax.random.randint(rng, (e,), 1, nb)
    dst_neg = (sg_dst + shift) % nb

    enabled = (n_bd_valid > 1)
    m = sg_mask & enabled

    if loss_type == "triplet":
        a = emb_tx[sg_src]
        p = emb_bd[sg_dst]
        ng = emb_bd[dst_neg]
        dp = jnp.sqrt(jnp.sum((a - p) ** 2, axis=-1) + 1e-12)
        dn = jnp.sqrt(jnp.sum((a - ng) ** 2, axis=-1) + 1e-12)
        per = jnp.maximum(dp - dn + margin, 0.0)
        return _masked_mean(per, m)
    elif loss_type == "bce":
        logit_pos = (emb_tx[sg_src] * emb_bd[sg_dst]).sum(-1)
        logit_neg = (emb_tx[sg_src] * emb_bd[dst_neg]).sum(-1)
        # BCEWithLogits: softplus(-x) for label 1, softplus(x) for label 0
        lp = jax.nn.softplus(-logit_pos)
        ln = jax.nn.softplus(logit_neg)
        sum_p, cnt_p = _masked_mean(lp, m)
        sum_n, cnt_n = _masked_mean(ln, m)
        return sum_p + sum_n, cnt_p + cnt_n
    raise ValueError(f"Unrecognized segmentation loss: '{loss_type}'.")


def cosine_weight_schedule(
    epoch: int, max_epochs: int, w_start, w_end, normalize: bool = True
):
    """Cosine ramp of loss weights from start to end over epochs
    (lightning_model.py:136-149).  Host-side helper returning a (3,) array.
    """
    import numpy as np

    me = max(1, max_epochs - 1)
    t = min(epoch, me) / me
    alpha = 0.5 * (1.0 + np.cos(np.pi * t))
    w = np.asarray(w_end) + (np.asarray(w_start) - np.asarray(w_end)) * alpha
    if normalize:
        w = w / (w.sum() + 1e-8)
    return w.astype(np.float32)


def loss_stats(
    k_tx,
    k_bd,
    k_sg,
    emb,
    tile,
    tx_similarity,
    bd_similarity,
    *,
    tx_margin: float,
    sg_margin: float,
    sg_loss_type: str,
    use_interior: bool,
    sg_tx=None,
):
    """Stacked (sum, count) statistics of the three losses for one tile.

    The one shared implementation behind the tiled trainer and the 1-D /
    2-D sharded train steps (they previously re-spelled this block):
    masks, host-precomputed sampler structures, triplet + metric +
    segmentation losses.

    ``use_interior`` restricts the tx/bd masks to tile interiors
    (margin-tile training semantics; whole-slide sharded training has no
    margins).  ``sg_tx`` overrides the tx embeddings used by the link
    loss (the sharded paths pass halo-extended embeddings because
    supervision sources live in extended index space).

    Returns jnp.stack([s_tx, c_tx, s_bd, c_bd, s_sg, c_sg]) (f32) —
    summable across tiles/shards before forming the masked means.
    """
    import jax.numpy as jnp

    tx_mask = tile.tx_valid & (tile.tx_cluster >= 0)
    bd_mask = tile.bd_valid & (tile.bd_cluster >= 0)
    if use_interior:
        tx_mask &= tile.tx_interior
        bd_mask &= tile.bd_interior
    tx_sort = (
        (tile.tx_sampler_sorted, tile.tx_sampler_counts)
        if tile.tx_sampler_sorted is not None
        else None
    )
    bd_sort = (
        (tile.bd_sampler_sorted, tile.bd_sampler_counts)
        if tile.bd_sampler_sorted is not None
        else None
    )
    s_tx, c_tx = triplet_loss(
        k_tx, emb["tx"], tile.tx_cluster, tx_mask, tx_similarity,
        margin=tx_margin, sort_structure=tx_sort,
    )
    s_bd, c_bd = metric_loss(
        k_bd, emb["bd"], tile.bd_cluster, bd_mask, bd_similarity,
        sort_structure=bd_sort,
    )
    s_sg, c_sg = segmentation_loss(
        k_sg,
        emb["tx"] if sg_tx is None else sg_tx,
        emb["bd"],
        tile.sg_src, tile.sg_dst, tile.sg_mask,
        tile.bd_valid.sum(),
        loss_type=sg_loss_type, margin=sg_margin,
    )
    return jnp.stack(
        [s_tx, c_tx.astype(jnp.float32),
         s_bd, c_bd.astype(jnp.float32),
         s_sg, c_sg.astype(jnp.float32)]
    )
