"""Device-side sparse ops over the padded-CSR layout.

These are the TPU replacements for torch_scatter / PyG segment ops used by
the reference's hot loop (SpMM/SDDMM inside GATv2Conv and the prediction
scatter_max, reference: src/segger/models/lightning_model.py:280-284).

All ops are pure functions of fixed-shape arrays: XLA fuses the gathers
into the surrounding elementwise work, and the row reductions vectorize on
the VPU.  A Pallas fused variant for the full GATv2 edge-attention +
aggregation lives in ``segger_tpu.ops.pallas``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .padded_csr import PaddedCSR

_NEG_INF = -1e30


def csr_gather(x_src: jnp.ndarray, csr: PaddedCSR) -> jnp.ndarray:
    """Gather source features per destination row: (N_src, F) -> (N_dst, K, F).

    Invalid slots gather an arbitrary in-range row; callers mask.
    ``clip`` mode: the PaddedCSR contract guarantees in-range
    indices (padding slots hold 0) — the default fill mode would emit a
    separate full-size bounds-compare + select pass after the gather
    (measured ~0.3 ms per 100 MB gathered at bench scale).
    """
    return jnp.take(x_src, csr.idx, axis=0, mode="clip")


def csr_spmm(
    x_src: jnp.ndarray,
    csr: PaddedCSR,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sparse matrix x dense matrix: per-destination (weighted) neighbor sum.

    Parameters
    ----------
    x_src : (N_src, F)
    weights : (N_dst, K) or (N_dst, K, H) optional per-edge weights.

    Returns
    -------
    (N_dst, F) — or (N_dst, H, F) for (N_dst, K, H) weights.
    """
    g = csr_gather(x_src, csr)  # (N_dst, K, F)
    m = csr.mask
    if weights is None:
        return jnp.where(m[..., None], g, 0).sum(axis=1)
    if weights.ndim == 2:
        w = jnp.where(m, weights, 0)
        return jnp.einsum("nk,nkf->nf", w, g)
    # multi-head: (N_dst, K, H) x (N_dst, K, F) -> (N_dst, H, F)
    w = jnp.where(m[..., None], weights, 0)
    return jnp.einsum("nkh,nkf->nhf", w, g)


def csr_sddmm(
    x_src: jnp.ndarray,
    x_dst: jnp.ndarray,
    csr: PaddedCSR,
) -> jnp.ndarray:
    """Sampled dense-dense matmul: per-edge dot products.

    Returns (N_dst, K) with ``x_dst[i] . x_src[j]`` per valid edge slot
    (invalid slots are zeroed).
    """
    g = csr_gather(x_src, csr)  # (N_dst, K, F)
    e = jnp.einsum("nf,nkf->nk", x_dst, g)
    return jnp.where(csr.mask, e, 0)


def csr_softmax(logits: jnp.ndarray, csr: PaddedCSR) -> jnp.ndarray:
    """Masked softmax across each destination row (the TPU replacement for
    PyG's per-destination-segment edge softmax).

    logits : (N_dst, K) or (N_dst, K, H); invalid slots get weight 0.
    Rows with no valid edges return all-zero weights.
    """
    m = csr.mask if logits.ndim == 2 else csr.mask[..., None]
    z = jnp.where(m, logits, _NEG_INF)
    z = z - jax.lax.stop_gradient(z.max(axis=1, keepdims=True))
    ez = jnp.where(m, jnp.exp(z), 0)
    denom = ez.sum(axis=1, keepdims=True)
    return ez / jnp.maximum(denom, 1e-30)


def row_gather_1d(table: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """``table[pos]`` for a 1-D table as a LANE-WIDE row gather.

    XLA lowers 1-D gathers on TPU to a devectorized loop (~150M
    elements/s — measured 0.33 ms for 50k lookups, r4 xplane traces);
    viewing the table as (rows, 128) makes it a row gather (~580M
    rows/s) plus a 2-pass one-hot in-row select.  The barrier keeps the
    gather out of surrounding loop fusions (fused, it devectorizes
    again)."""
    m = table.shape[0]
    m_pad = -(-m // 128) * 128
    t2 = jnp.pad(table, (0, m_pad - m)).reshape(-1, 128)
    rows = jax.lax.optimization_barrier(
        jnp.take(t2, pos // 128, axis=0)
    )
    col = (pos % 128)[:, None]
    return jnp.where(
        jnp.arange(128)[None, :] == col, rows, 0
    ).sum(axis=1)


def csr_max(
    values: jnp.ndarray, csr: PaddedCSR
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Masked row max + argmax; the padded-CSR form of scatter_max.

    Reproduces the reference's "no candidate => unassigned" contract
    (src/segger/models/lightning_model.py:280-293): rows with no valid
    slots return ``(-inf-ish value, -1)``.

    Parameters
    ----------
    values : (N_dst, K)

    Returns
    -------
    max_val : (N_dst,) — masked max (``-1e30`` for empty rows)
    arg : (N_dst,) int32 — ``csr.idx`` entry of the argmax slot, or -1.
    """
    z = jnp.where(csr.mask, values, _NEG_INF)
    max_val = z.max(axis=1)
    slot = jnp.argmax(z, axis=1)
    has_any = csr.mask.any(axis=1)
    # one-hot select over the K slots instead of take_along_axis: the
    # per-row single-element gather devectorizes on TPU (part of the
    # 0.85 ms argmax+map chain in the r4 predict decomposition)
    picked = jnp.where(
        jnp.arange(csr.idx.shape[1])[None, :] == slot[:, None],
        csr.idx, 0,
    ).sum(axis=1)
    arg = jnp.where(has_any, picked, -1)
    return max_val, arg


@jax.custom_vjp
def take_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Row gather ``x[idx]`` with a sort-based (scatter-free) backward.

    NOTE (measured on TPU v5e / XLA 2026-era): plain-indexing autodiff
    (scatter-add backward) is ~4x FASTER than this sort-based VJP at
    50k rows — TPU sort lowers to a slow while-loop while scatter-add
    is efficient on current XLA.  The losses therefore use plain
    indexing; this op remains for backends where scatter serializes.

    The VJP computes the segment sum with sort + cumsum + searchsorted:

        order    = argsort(idx)
        csum     = cumsum(g[order])
        grad_x[v] = csum[end_v - 1] - csum[start_v - 1]

    where [start_v, end_v) locate v's block in the sorted index array.
    """
    return jnp.take(x, idx, axis=0)


def _take_rows_fwd(x, idx):
    return jnp.take(x, idx, axis=0), (idx, x.shape[0])


def _take_rows_bwd(res, g):
    idx, n = res
    order = jnp.argsort(idx)
    sorted_idx = idx[order]
    sorted_g = jnp.take(g, order, axis=0)
    csum = jnp.cumsum(sorted_g, axis=0)
    nodes = jnp.arange(n)
    start = jnp.searchsorted(sorted_idx, nodes, side="left")
    end = jnp.searchsorted(sorted_idx, nodes, side="right")
    # inclusive prefix: sum over [start, end) = csum[end-1] - csum[start-1]
    zero = jnp.zeros((1, *g.shape[1:]), g.dtype)
    csum_pad = jnp.concatenate([zero, csum], axis=0)  # csum_pad[i]=sum<i
    grad_x = jnp.take(csum_pad, end, axis=0) - jnp.take(
        csum_pad, start, axis=0
    )
    return grad_x, None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def csr_gather_t(x_src, csr: PaddedCSR, csr_t: PaddedCSR):
    """Gather with a scatter-free backward.

    Forward is :func:`csr_gather`; the VJP routes cotangents through the
    precomputed transpose table ``csr_t`` (see
    :func:`segger_tpu.ops.padded_csr.transpose_csr`) as another gather +
    masked row-sum.  XLA's default transpose-of-gather is a scatter-add,
    which *serializes* on TPU (~400x slower than the forward at
    Xenium-tile scale); this keeps the backward on the same
    gather/VPU-reduce path as the forward.
    """
    return csr_gather(x_src, csr)


def _csr_gather_t_fwd(x_src, csr, csr_t):
    return csr_gather(x_src, csr), (csr, csr_t)


def _csr_gather_t_bwd(res, g_grad):
    csr, csr_t = res
    n_dst, k = csr.idx.shape
    # zero out cotangents on invalid slots, flatten to (N_dst*K, F)
    flat = jnp.where(csr.mask[..., None], g_grad, 0).reshape(
        n_dst * k, *g_grad.shape[2:]
    )
    rows = jnp.take(
        flat, csr_t.idx, axis=0, mode="clip"
    )  # (N_src, K_T, F)
    grad_x = jnp.where(csr_t.mask[..., None], rows, 0).sum(axis=1)
    return grad_x, None, None


csr_gather_t.defvjp(_csr_gather_t_fwd, _csr_gather_t_bwd)


def segment_sum(data, segment_ids, num_segments):
    """COO-path segment sum (used off the hot path / in tests)."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def _score_backend() -> str:
    """Backend for the candidate-scoring chain.

    'xla'    — the plain jnp chain below (DEFAULT, both backends).
    'pallas' — fused cosine+max/argmax kernel (ops/pallas/score).

    Measured (v5e, bench tile, 2026-08-20, tools/predict_decompose.py +
    tools/score_ab.py): standalone — fixed embeddings, scoring chain
    only — the kernel wins ~0.1 ms (bf16 0.84-0.95 vs 0.93-1.00 across
    three same-session pairs).  Embedded in the REAL predict chain
    (forward + scoring, interleaved ABAB) it is a wash: 7.71/7.62 vs
    7.58/7.61 ms — XLA fuses the all-XLA scoring chain into the final
    layer's epilogue, and the pallas_call's materialization boundary
    gives that saving back.  Default stays 'xla' (same standard as the
    round-4 falsified-lever reverts); SEGGER_SCORE=pallas opts in."""
    import os

    choice = os.environ.get("SEGGER_SCORE", "").strip().lower()
    if choice in ("xla", "pallas"):
        return choice
    return "xla"


def score_candidates(
    emb_tx: jnp.ndarray,
    bd_feats: jnp.ndarray,
    cand: PaddedCSR,
    bd_index: jnp.ndarray,
    dtype: jnp.dtype | None = None,
    normalized: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-score tx->bd candidate edges and take the per-transcript
    argmax assignment — the reference's predict_step similarity +
    scatter_max (src/segger/models/lightning_model.py:275-293).

    ``bd_feats`` may be local or halo-extended bd embeddings (``cand``
    indexes into whichever space it was built for); ``bd_index`` maps
    those rows to global cell encodings (-1 padding allowed).

    Returns (max_sim, cell_encoding int32) with -1 for transcripts that
    have no candidates.  Shared by tiled prediction, the 1-D halo and
    2-D grid sharded predict paths, and bench.py — assignment semantics
    live in exactly one place.
    """
    # normalize BEFORE the gather: row norms cost O(n_bd*F) + O(n_tx*F)
    # there, vs re-reading the gathered (n_tx, K, F) tensor a second
    # time for its norms (the gather output is the biggest tensor in
    # the predict step; its HBM traffic dominates).  ``dtype`` (e.g.
    # bf16) halves the gather bytes — measured 0.95 -> 0.66 ms at bench
    # scale (tools/predict_decompose.py) — while normalization stats
    # and the cosine accumulate in f32, so similarity values stay f32
    # for the downstream Yen/Li thresholds.
    if dtype is not None:
        bd_feats = bd_feats.astype(dtype)
        emb_tx = emb_tx.astype(dtype)
    if normalized:
        # the encoder's normalize_embeddings already emitted unit
        # vectors (models/encoder.py safe_normalize): the cosine is the
        # plain dot product, so the two normalization passes (and
        # their extra reads of both embedding tables) are skipped
        bdn, txn = bd_feats, emb_tx
    else:
        bd32 = bd_feats.astype(jnp.float32)
        tx32 = emb_tx.astype(jnp.float32)
        bdn = (
            bd32 * jax.lax.rsqrt(
                jnp.maximum((bd32 * bd32).sum(-1, keepdims=True), 1e-16)
            )
        ).astype(bd_feats.dtype)
        txn = (
            tx32 * jax.lax.rsqrt(
                jnp.maximum((tx32 * tx32).sum(-1, keepdims=True), 1e-16)
            )
        ).astype(emb_tx.dtype)
    backend = _score_backend()
    if backend == "pallas":
        from .pallas import score as _ps

        if _ps.supported(cand, txn.shape[-1]):
            # forced SEGGER_SCORE=pallas off-TPU runs in interpret mode
            interp = jax.default_backend() != "tpu"
            max_sim, slot = _ps.score_max_pallas(
                txn, bdn, cand, interpret=interp
            )
            k = cand.idx.shape[1]
            picked = jnp.where(
                jnp.arange(k)[None, :] == slot[:, None], cand.idx, 0
            ).sum(axis=1)
            seg = jnp.where(
                slot >= 0, row_gather_1d(bd_index, picked), -1
            )
            return max_sim, seg.astype(jnp.int32)
    g = csr_gather(bdn, cand)
    cos = jnp.einsum(
        "nf,nkf->nk", txn, g, preferred_element_type=jnp.float32
    )
    max_sim, arg = csr_max(cos, cand)
    seg = jnp.where(
        arg >= 0, row_gather_1d(bd_index, jnp.maximum(arg, 0)), -1
    )
    return max_sim, seg.astype(jnp.int32)


def segment_max(data, segment_ids, num_segments):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(logits, segment_ids, num_segments):
    """COO-path segment softmax (reference semantics of PyG softmax)."""
    seg_max = jax.ops.segment_max(
        logits, segment_ids, num_segments=num_segments
    )
    seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0)
    z = jnp.exp(logits - seg_max[segment_ids])
    denom = jax.ops.segment_sum(z, segment_ids, num_segments=num_segments)
    return z / jnp.maximum(denom[segment_ids], 1e-30)
