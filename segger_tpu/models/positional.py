"""Sinusoidal 2D positional embedding.

Math matches the reference's ``Positional2dEmbedder``
(src/segger/models/ist_encoder.py:22-79): per-axis sinusoidal frequency
embedding of tile-normalized coordinates through a Linear-SiLU-Linear MLP,
concatenated across the two axes.

The reference normalizes coordinates per batch-graph with a Python loop
over tile ids (ist_encoder.py:66-74); here each tile is its own vmapped
program, so normalization is a masked min/max — no loop, no dynamic shapes.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_embedding(
    x: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """(...,) -> (..., dim) sinusoidal features, cos-first ordering
    (matches ist_encoder.py:22-31)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = x[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


class Positional2dEmbedder(nn.Module):
    """Embed (x, y) positions into ``2 * (hidden_size // 2)`` features."""

    hidden_size: int
    frequency_embedding_size: int = 256

    @nn.compact
    def __call__(
        self,
        pos: jnp.ndarray,
        valid: jnp.ndarray,
        prenormalized: bool = False,
    ) -> jnp.ndarray:
        dim = self.hidden_size // 2
        if prenormalized:
            # caller already mapped coordinates to [0, 1] (e.g. globally,
            # for sharded whole-slide execution where per-shard min/max
            # would differ across devices)
            p = pos
        else:
            # normalize per tile over valid nodes (reference normalizes
            # per batch-graph: ist_encoder.py:66-74)
            big = jnp.float32(1e30)
            vm = valid[:, None]
            mins = jnp.min(jnp.where(vm, pos, big), axis=0)
            maxs = jnp.max(jnp.where(vm, pos, -big), axis=0)
            p = (pos - mins) / (maxs - mins + 1e-8)

        freq = sinusoidal_embedding(p, self.frequency_embedding_size)
        mlp = nn.Sequential(
            [nn.Dense(dim), nn.silu, nn.Dense(dim)]
        )
        emb = mlp(freq)  # (N, 2, dim)
        return emb.reshape(emb.shape[0], -1)  # (N, 2*dim)
