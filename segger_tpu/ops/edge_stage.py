"""Fused GATv2 edge stage with a hand-derived backward.

Autodiff of the edge stage (gather -> LeakyReLU attention -> masked
softmax -> weighted aggregation) emits a long chain of unfused
(N_dst, K, H*C)-shaped ops: at Xenium-tile scale the compiled backward
streams ~80 GB of HBM per step (~130 ms on a v5e — measured, see
bench.py history).  This custom VJP recomputes the cheap forward
intermediates from the 25 MB xl/xr residuals and evaluates the gradient
in a handful of passes over the single large (N, K, H*C) tensor.

Dropout on the attention coefficients (the reference applies rate-0.2
dropout there, ist_encoder.py:111-131) is supported via an external
keep mask so the op stays deterministic given its inputs.

Math (per dst i, slot j, head h, channel c):
    g     = xl[idx]
    p     = g + xr[:, None]
    s     = leaky_relu(p)
    e     = sum_c s_hc * att_hc
    a     = masked softmax_j(e)          (then a *= keep/rate if mask)
    out   = sum_j a_jh * g_jhc

Backward given G = d out (N, H, C):
    dA    = sum_c G_hc g_jhc             (then *= keep/rate)
    de    = a * (dA - sum_j a * dA)      (softmax VJP, masked)
    dp    = (de_h att_hc) * leaky'(p)
    dg    = a_jh G_hc + dp
    dxr   = sum_j dp
    datt  = sum_ij de * s
    dxl   = transpose-gather(dg)         (scatter-free, via csr_t)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .padded_csr import PaddedCSR

_NEG_INF = -1e30


def _forward_pieces(xl, xr, att, csr, heads, slope):
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    ch = hc // heads
    g = jnp.take(xl, csr.idx, axis=0,
                 mode="clip")  # (N, K, HC)
    p = g + xr[:, None, :]
    s = jnp.where(p > 0, p, slope * p)
    sh = s.reshape(n_dst, k, heads, ch)
    logits = jnp.einsum("nkhc,hc->nkh", sh, att)
    m = csr.mask[..., None]
    z = jnp.where(m, logits, _NEG_INF)
    z = z - jax.lax.stop_gradient(z.max(axis=1, keepdims=True))
    ez = jnp.where(m, jnp.exp(z), 0.0)
    alpha = ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    return g, p, s, alpha


def gatv2_edge_stage(
    xl, xr, att, keep_mask, csr: PaddedCSR, csr_t: PaddedCSR,
    config: tuple,
):
    """Fused edge stage.

    Parameters
    ----------
    xl : (N_src, H*C); xr : (N_dst, H*C); att : (H, C)
    keep_mask : (N_dst, K, H) float multiplier on the attention
        coefficients (1.0 = no dropout; Bernoulli(keep)/keep for
        dropout), or any array broadcastable to that shape (the
        broadcast happens OUTSIDE the custom VJP, so gradients of a
        scalar/broadcast mask reduce correctly instead of tripping the
        cotangent-shape check).
    config : (heads, negative_slope) — static.
    """
    keep_mask = jnp.broadcast_to(
        jnp.asarray(keep_mask, xl.dtype), (*csr.idx.shape, config[0])
    )
    return _gatv2_edge_stage(xl, xr, att, keep_mask, csr, csr_t, config)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gatv2_edge_stage(
    xl, xr, att, keep_mask, csr: PaddedCSR, csr_t: PaddedCSR,
    config: tuple,
):
    heads, slope = config
    g, _, _, alpha = _forward_pieces(xl, xr, att, csr, heads, slope)
    n_dst, k = csr.idx.shape
    ch = xl.shape[-1] // heads
    a = alpha * keep_mask
    gh = g.reshape(n_dst, k, heads, ch)
    out = jnp.einsum("nkh,nkhc->nhc", a, gh)
    return out.reshape(n_dst, heads * ch)


def _fwd(xl, xr, att, keep_mask, csr, csr_t, config):
    out = _gatv2_edge_stage(xl, xr, att, keep_mask, csr, csr_t, config)
    return out, (xl, xr, att, keep_mask, csr, csr_t)


def _bwd(config, res, G):
    """Low-traffic backward.

    The naive chain (materialize dg (N,K,HC), transpose-gather it)
    streams ~80 GB at Xenium-tile scale because the big tensors cannot
    fuse across the gather.  Here only *small* per-edge tensors
    (alpha/de, (N,K,H)) are materialized; every (·,·,H*C)-sized quantity
    lives inside a fused gather→elementwise→reduce pass:

      - dalpha, datt, dxr: one recompute pass over g in destination space
      - dxl: evaluated directly in *transpose space* — for each source
        row, gather its consumers' (dst, slot) coordinates and recompute
        the contribution a·G + (de·att)·leaky'(xl_s + xr_dst) there,
        so dg never exists in HBM.
    """
    heads, slope = config
    xl, xr, att, keep_mask, csr, csr_t = res
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    ch = hc // heads

    g, p, s, alpha = _forward_pieces(xl, xr, att, csr, heads, slope)
    gh = g.reshape(n_dst, k, heads, ch)
    sh = s.reshape(n_dst, k, heads, ch)
    Gh = G.reshape(n_dst, heads, ch)

    # small (N, K, H) quantities
    dA_masked = jnp.einsum("nhc,nkhc->nkh", Gh, gh)
    d_keep = alpha * dA_masked
    dalpha = dA_masked * keep_mask
    inner = (alpha * dalpha).sum(axis=1, keepdims=True)
    de = alpha * (dalpha - inner)                    # (N, K, H)
    a = alpha * keep_mask

    # datt: one fused pass over the recomputed s
    datt = jnp.einsum("nkh,nkhc->hc", de, sh)

    # dxr: sum_k (de ⊗ att) * leaky'(p) — fused pass over p recompute
    leak = jnp.where(p > 0, 1.0, slope).reshape(n_dst, k, heads, ch)
    dxr = jnp.einsum("nkh,hc,nkhc->nhc", de, att, leak).reshape(
        n_dst, hc
    )

    # dxl in transpose space: per source row s and consumer slot t,
    #   contrib = a_t * G[dst_t] + (de_t * att) * leaky'(xl_s + xr[dst_t])
    t_pos = csr_t.idx                                # (Ns, Kt) flat i*K+j
    i_t = t_pos // k                                 # dst rows
    a_flat = a.reshape(n_dst * k, heads)
    de_flat = de.reshape(n_dst * k, heads)
    a_t = jnp.take(a_flat, t_pos, axis=0,
                   mode="clip")  # (Ns, Kt, H)
    de_t = jnp.take(de_flat, t_pos, axis=0, mode="clip")
    G_t = jnp.take(Gh, i_t, axis=0,
                   mode="clip")  # (Ns, Kt, H, C)
    xr_t = jnp.take(xr, i_t, axis=0,
                    mode="clip")  # (Ns, Kt, HC)
    p_t = (xl[:, None, :] + xr_t).reshape(
        xl.shape[0], t_pos.shape[1], heads, ch
    )
    leak_t = jnp.where(p_t > 0, 1.0, slope)
    contrib = a_t[..., None] * G_t + (
        de_t[..., None] * att[None, None]
    ) * leak_t                                        # (Ns, Kt, H, C)
    contrib = contrib.reshape(xl.shape[0], t_pos.shape[1], hc)
    dxl = jnp.where(csr_t.mask[..., None], contrib, 0.0).sum(axis=1)
    return dxl, dxr, datt, d_keep, None, None


_gatv2_edge_stage.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# flat-layout variant (experimental): all per-edge intermediates shaped
# (N*K, ·) so the TPU lane dimension is fully utilized; attention logits
# via a block-diagonal matmul instead of a (N, K, H)-shaped reduce.
# Op-level traces show the (N, K, H)-shaped elementwise chain runs at
# ~2% lane utilization (H=2 in a 128-lane register); this variant keeps
# head-indexed tensors 2-D.
# ----------------------------------------------------------------------
def _att_blockdiag(att: jnp.ndarray) -> jnp.ndarray:
    """(H, C) attention vectors -> (H*C, H) block-diagonal matrix so that
    ``s_flat @ A`` computes per-head logits on the MXU."""
    heads, ch = att.shape
    eye = jnp.eye(heads, dtype=att.dtype)  # (H, H)
    # A[h*ch + c, h'] = att[h, c] * [h == h']
    return (att[:, :, None] * eye[:, None, :]).reshape(
        heads * ch, heads
    )


def gatv2_edge_stage_flat(
    xl, xr, att, keep_mask, csr: PaddedCSR, csr_t: PaddedCSR,
    config: tuple,
):
    """Flat-layout fused edge stage (see module docstring).  Accepts
    any ``keep_mask`` broadcastable to (N_dst, K, H); the broadcast
    happens outside the custom VJP."""
    keep_mask = jnp.broadcast_to(
        jnp.asarray(keep_mask, xl.dtype), (*csr.idx.shape, config[0])
    )
    return _gatv2_edge_stage_flat(
        xl, xr, att, keep_mask, csr, csr_t, config
    )


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _gatv2_edge_stage_flat(
    xl, xr, att, keep_mask, csr: PaddedCSR, csr_t: PaddedCSR,
    config: tuple,
):
    heads, slope = config
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    ch = hc // heads
    g = jnp.take(xl, csr.idx.reshape(-1), axis=0,
                 mode="clip")    # (N*K, HC)
    p = g + jnp.repeat(xr, k, axis=0)
    s = jnp.where(p > 0, p, slope * p)
    logits = s @ _att_blockdiag(att)                  # (N*K, H) on MXU
    m = csr.mask.reshape(n_dst * k, 1)
    z = jnp.where(m, logits, _NEG_INF).reshape(n_dst, k, heads)
    z = z - jax.lax.stop_gradient(z.max(axis=1, keepdims=True))
    ez = jnp.where(m.reshape(n_dst, k, 1), jnp.exp(z), 0.0)
    alpha = (
        ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    ).reshape(n_dst * k, heads)
    a = alpha * keep_mask.reshape(n_dst * k, heads)
    # out[n,h,c] = sum_k a[nk,h] g[nk,(h,c)] — expand a across channels
    a_exp = jnp.repeat(a, ch, axis=1)                 # (N*K, HC)
    out = (a_exp * g).reshape(n_dst, k, hc).sum(axis=1)
    return out


def _fwd_flat(xl, xr, att, keep_mask, csr, csr_t, config):
    heads, slope = config
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    ch = hc // heads
    nk = n_dst * k
    g = jnp.take(xl, csr.idx.reshape(-1), axis=0,
                 mode="clip")
    p = g + jnp.repeat(xr, k, axis=0)
    sign = p > 0                                      # residual (1B/elem)
    s = jnp.where(sign, p, slope * p)
    logits = s @ _att_blockdiag(att)
    m = csr.mask.reshape(nk, 1)
    z = jnp.where(m, logits, _NEG_INF).reshape(n_dst, k, heads)
    z = z - jax.lax.stop_gradient(z.max(axis=1, keepdims=True))
    ez = jnp.where(csr.mask[..., None], jnp.exp(z), 0.0)
    alpha = (
        ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    ).reshape(nk, heads)                              # residual (small)
    a = alpha * keep_mask.reshape(nk, heads)
    a_exp = jnp.repeat(a, ch, axis=1)
    out = (a_exp * g).reshape(n_dst, k, hc).sum(axis=1)
    return out, (xl, xr, att, keep_mask, csr, csr_t, alpha, sign)


def _bwd_flat(config, res, G):
    """Backward from stored (alpha, sign(p)) residuals: the expensive
    recompute chain (p -> s -> logits -> softmax) is replaced by the
    6 MB alpha and ~100 MB sign arrays; only g is re-gathered."""
    heads, slope = config
    xl, xr, att, keep_mask, csr, csr_t, alpha, sign = res
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    ch = hc // heads
    nk = n_dst * k

    g = jnp.take(xl, csr.idx.reshape(-1), axis=0,
                 mode="clip")
    keep = keep_mask.reshape(nk, heads)
    a = alpha * keep
    A = _att_blockdiag(att)

    G_rep = jnp.repeat(G, k, axis=0)                  # (N*K, HC)
    # dA_masked[nk,h] = sum_c G[n,(h,c)] g[nk,(h,c)] — headwise row dot
    prod = G_rep * g                                  # (N*K, HC)
    dA_masked = prod.reshape(nk, heads, ch).sum(-1)   # (N*K, H)
    d_keep = alpha * dA_masked
    dalpha = dA_masked * keep
    inner = (
        (alpha * dalpha).reshape(n_dst, k, heads).sum(
            axis=1, keepdims=True
        )
    )
    de = (
        alpha.reshape(n_dst, k, heads)
        * (dalpha.reshape(n_dst, k, heads) - inner)
    ).reshape(nk, heads)

    # datt needs s = leaky(p); rebuild from g + sign (one fused pass)
    p = g + jnp.repeat(xr, k, axis=0)
    s = jnp.where(sign, p, slope * p)
    datt_flat = s.T @ de                              # (HC, H) on MXU
    # extract the block diagonal: datt[h, c] = datt_flat[h*ch + c, h]
    datt = jnp.einsum(
        "hch->hc", datt_flat.reshape(heads, ch, heads)
    )

    leak = jnp.where(sign, 1.0, slope)
    dp = (de @ A.T) * leak                            # (N*K, HC) via MXU
    m = csr.mask.reshape(nk, 1)
    dg = jnp.repeat(a, ch, axis=1) * G_rep + dp
    dg = jnp.where(m, dg, 0.0)
    dxr = dp.reshape(n_dst, k, hc).sum(axis=1)
    rows = jnp.take(dg, csr_t.idx, axis=0,
                    mode="clip")     # (Ns, Kt, HC)
    dxl = jnp.where(csr_t.mask[..., None], rows, 0.0).sum(axis=1)
    return dxl, dxr, datt, d_keep.reshape(keep_mask.shape), None, None


_gatv2_edge_stage_flat.defvjp(_fwd_flat, _bwd_flat)
