"""Embedding lookup with a matmul (scatter-free) backward.

``nn.Embed``'s backward is a scatter-add of one row per lookup into the
embedding table — scatters serialize on TPU.  Here the VJP computes the
table gradient as ``one_hot(ids)^T @ cotangent`` — a single MXU matmul
(n_ids x n_vocab x features FLOPs, trivial at vocabulary sizes of gene
panels).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def embed_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


def _fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _bwd(res, g):
    ids, n_vocab = res
    onehot = jax.nn.one_hot(ids, n_vocab, dtype=g.dtype)  # (N, V)
    grad_table = jnp.einsum(
        "nv,nf->vf", onehot, g, preferred_element_type=jnp.float32
    )
    return grad_table.astype(g.dtype), None


embed_lookup.defvjp(_fwd, _bwd)
