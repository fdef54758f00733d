"""Fused candidate-scoring kernel (Pallas TPU).

The prediction assignment (reference: cosine similarity + scatter_max,
src/segger/models/lightning_model.py:275-293) runs as
``ops.gather_agg.score_candidates``: an XLA candidate gather followed by
an einsum + masked max/argmax/one-hot chain.  The gather is row-rate
bound (~0.31 ms at bench scale) and unavoidable (see
ops/pallas/banded.py), but the downstream chain measured ~0.35 ms on the
XLA path (tools/predict_decompose.py, bf16) — an order of magnitude over
its traffic floor, because the per-row dot products and the
max/argmax/select passes each re-stream (N, K)-shaped intermediates with
poor fusion.

This kernel streams the gathered (N, K, F) tensor through VMEM once and
emits, per destination row, the masked max cosine and the argmax SLOT
(first-max tie-breaking, matching ``jnp.argmax``); empty rows yield
(-1e30, -1) — the reference's "no candidate => unassigned" contract.
The slot -> csr.idx -> bd_index encoding map stays outside (tiny (N, K)
one-hot + a lane-wide row gather).

STATUS (2026-08-20, v5e, bench tile): NOT the default.  Standalone the
kernel beats the XLA chain by ~0.1 ms (bf16-normalized config, three
same-session pairs), but interleaved ABAB inside the full predict chain
(tools/score_ab.py) it is a wash — when the scoring chain is all-XLA,
XLA fuses it into the final conv layer's epilogue, and the pallas_call
boundary (the forced (N, K, F) materialization) costs exactly what the
fused pass saves.  Kept as SEGGER_SCORE=pallas for toolchains whose
fusion behaves differently; ops.gather_agg._score_backend documents the
dispatch.

Layout: destination rows on sublanes, F on lanes (same stance as
ops/pallas/postgather.py); cosine accumulation in f32 regardless of the
feature dtype, so bf16 scoring stays threshold-grade (docs/design.md §6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU images
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..padded_csr import PaddedCSR

_NEG_INF = -1e30
_F32 = jnp.float32

# rows per grid step: (B, K, F) f32 in flight is ~1 MB at K=4, F<=128
_BLOCK_ROWS = 512


def _score_kernel(tx_ref, g_ref, mask_ref, max_ref, slot_ref):
    """One destination block: cosine + masked max/argmax.

    tx_ref   : (B, F) destination (tx) features
    g_ref    : (B, K, F) gathered candidate (bd) features
    mask_ref : (B, K) f32 (1.0 = real candidate)
    max_ref  : (B, 1) f32 masked max cosine (-1e30 for empty rows)
    slot_ref : (B, 1) int32 argmax slot (first max), -1 for empty rows
    """
    g = g_ref[:].astype(_F32)
    tx = tx_ref[:].astype(_F32)
    cos = (g * tx[:, None, :]).sum(axis=2)          # (B, K) f32
    mask_f = mask_ref[:]
    z = jnp.where(mask_f > 0, cos, _NEG_INF)
    maxv = z.max(axis=1, keepdims=True)             # (B, 1)
    k = z.shape[1]
    iota_k = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    slot = jnp.where(z == maxv, iota_k, k).min(axis=1, keepdims=True)
    # bool reductions are unsupported in Mosaic: reduce the f32 mask
    has_any = mask_f.max(axis=1, keepdims=True) > 0
    max_ref[:] = maxv
    slot_ref[:] = jnp.where(has_any, slot, -1)


def _pad_rows(x, n_pad, fill=0):
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_max_pallas(
    emb_tx: jnp.ndarray,
    bd_feats: jnp.ndarray,
    cand: PaddedCSR,
    interpret: bool = False,
):
    """Masked max cosine + argmax slot over candidate edges.

    ``emb_tx``/``bd_feats`` are assumed pre-normalized (or the caller
    normalizes first); returns ``(max_sim (N,) f32, slot (N,) int32)``
    with ``(-1e30, -1)`` for rows without candidates.
    """
    n_dst, k = cand.idx.shape
    f = emb_tx.shape[-1]
    blk = _BLOCK_ROWS
    n_pad = -(-n_dst // blk) * blk
    idx = _pad_rows(cand.idx, n_pad)
    mask_f = _pad_rows(cand.mask, n_pad).astype(jnp.float32)
    # clip mode: PaddedCSR idx are in-range by contract (padding holds 0)
    g3 = jnp.take(
        bd_feats, idx.reshape(-1), axis=0, mode="clip"
    ).reshape(n_pad, k, f)
    tx_p = _pad_rows(emb_tx, n_pad)
    max_p, slot_p = pl.pallas_call(
        _score_kernel,
        grid=(n_pad // blk,),
        in_specs=[
            pl.BlockSpec((blk, f), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k, f), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), _F32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tx_p, g3, mask_f)
    return max_p[:n_dst, 0], slot_p[:n_dst, 0]


def supported(cand: PaddedCSR, f: int) -> bool:
    """Shape gate: K and F bounded so a (B, K, F) block fits VMEM."""
    if not _HAS_PLTPU:
        return False
    k = cand.idx.shape[1]
    return 1 <= k <= 64 and f <= 512
