"""GATv2 convolution over padded-CSR adjacency.

Math matches PyG's ``GATv2Conv`` (used by the reference's SkipGAT layer,
reference: src/segger/models/ist_encoder.py:109-134) with
``share_weights=False``, ``concat=True``, ``negative_slope=0.2``:

    x_l = W_l x_src + b_l                        (per source node)
    x_r = W_r x_dst + b_r                        (per destination node)
    e_ij = a_h . leaky_relu(x_l[j] + x_r[i])     (per edge, per head h)
    alpha = softmax_j(e_ij)                      (over i's in-edges)
    out_i = concat_h( sum_j alpha_ij x_l[j,h] ) + bias

On TPU this is two dense matmuls (MXU), one gather, and masked row-wise
VPU reductions — no scatter ops.  Destinations with no in-edges output
``bias`` only (same as PyG's zero-fill + bias).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import PaddedCSR, csr_softmax

_NEG_INF = -1e30


def _edge_stage_backend() -> str:
    """Select the fused edge-stage implementation.

    'pallas' — the post-gather fused TPU kernel (ops/pallas/postgather):
    streams the gathered (N*K, H*C) tensor through VMEM once instead of
    materializing the p/s/logits/alpha chain in HBM.  Default on TPU.
    'xla' — the flat-layout XLA path with the hand-derived backward
    (ops/edge_stage).  Default elsewhere; force with
    SEGGER_EDGE_STAGE=xla|pallas."""
    import os

    choice = os.environ.get("SEGGER_EDGE_STAGE", "auto")
    if choice in ("xla", "pallas"):
        return choice
    import jax

    return "pallas" if jax.default_backend() == "tpu" else "xla"


class GATv2Conv(nn.Module):
    """Single-edge-type GATv2 attention convolution (bipartite-capable)."""

    out_channels: int
    heads: int = 1
    negative_slope: float = 0.2
    dropout: float = 0.0
    share_weights: bool = False
    dtype: jnp.dtype | None = None  # compute dtype (bf16 halves HBM
                                    # traffic of the edge stage); params
                                    # stay float32

    @nn.compact
    def __call__(
        self,
        x_src: jnp.ndarray,
        x_dst: jnp.ndarray,
        csr: PaddedCSR,
        deterministic: bool = True,
        csr_t: PaddedCSR | None = None,
        capture_attention: bool = False,
        split: tuple | None = None,
    ) -> jnp.ndarray:
        """``csr_t``: optional transpose table enabling the scatter-free
        gather backward (required for fast training on TPU; see
        ops.gather_agg.csr_gather_t).  ``capture_attention`` switches to
        the unfused path for this call so the attention coefficients are
        sown under ``intermediates`` (the fused kernels never
        materialize them; reference analogue: the forward-hook capture,
        ist_encoder.py:137-158).

        ``split``: optional degree-bucketing of the fused TPU path —
        ``(n_lo, k_lo, csr_lo_t, csr_hi_t)`` with ``n_lo``/``k_lo``
        static ints.  Destination rows [0, n_lo) must have in-degree
        <= k_lo (data/partition.py::apply_degree_bucketing); the edge
        stage then runs a narrow kernel on them and the full-width
        kernel on the tail, skipping most padding traffic of the
        gather.  Ignored off the Pallas path."""
        h, c = self.heads, self.out_channels
        glorot = nn.initializers.glorot_uniform()
        lin_l = nn.Dense(
            h * c, kernel_init=glorot, dtype=self.dtype, name="lin_l"
        )
        if self.share_weights:
            lin_r = lin_l
        else:
            lin_r = nn.Dense(
                h * c, kernel_init=glorot, dtype=self.dtype, name="lin_r"
            )
        att = self.param("att", glorot, (1, h, c))
        bias = self.param("bias", nn.initializers.zeros, (h * c,))
        if self.dtype is not None:
            att = att.astype(self.dtype)

        if isinstance(x_src, (tuple, list)):
            # halo-extended source delivered in pieces: [local |
            # from_left | from_right] (parallel/halo.py::_exchange_1d).
            # Projecting piecewise keeps the large local matmul
            # independent of the ppermute producing the halo rows, so
            # XLA's latency-hiding scheduler overlaps the exchange with
            # compute; concat-then-project would serialize them.
            xl = jnp.concatenate([lin_l(p) for p in x_src], axis=0)
        else:
            xl = lin_l(x_src)  # (N_src, H*C)
        xr = lin_r(x_dst)  # (N_dst, H*C)

        if (csr_t is not None or split is not None) \
                and not capture_attention:
            # fused edge stage: Pallas post-gather kernel on TPU,
            # flat-layout XLA path with the hand-derived low-traffic
            # backward elsewhere.  Neither materializes the attention
            # coefficients — pass capture_attention=True to introspect.
            # Degree-bucketed tiles ship per-segment transpose tables
            # only (csr_t is None; the full transpose would be dead
            # weight) — both backends consume the split directly.
            backend = _edge_stage_backend()
            dropout_on = self.dropout > 0.0 and not deterministic
            if backend == "pallas":
                from ..ops.pallas import postgather

                # Forced SEGGER_EDGE_STAGE=pallas on a non-TPU backend
                # runs the kernels in interpret mode (Mosaic can only
                # lower them on TPU); the counter-hash dropout stream is
                # identical in both modes.
                interp = jax.default_backend() != "tpu"
                if dropout_on:
                    # (2,) seed: keep multipliers are generated inside
                    # the kernels (TPU PRNG) and regenerated in the
                    # backward — no (N, K, H) keep tensor in HBM
                    # (measured ~11 ms/step of XLA-side bernoulli +
                    # keep streaming at bench scale)
                    rng = self.make_rng("dropout")
                    keep = postgather.prng_dropout_seed(rng)
                    cfg = (h, self.negative_slope, interp, self.dropout)
                else:
                    # (1, 1, H) sentinel: the kernel skips the keep
                    # machinery entirely
                    keep = postgather.no_dropout_keep(h, xl.dtype)
                    cfg = (h, self.negative_slope, interp)

                if split is not None and postgather.supported(csr, h * c, h):
                    # split = (segments, n_tail_start, csr_hi_t):
                    # narrow kernels over the leading degree-bucketed
                    # row segments (each (start, stop, k, csr_t)), one
                    # full-width kernel on the tail
                    segs, n_tail, csr_hi_t = split
                    outs = []
                    for si, (a, b, kseg, csr_seg_t) in enumerate(segs):
                        csr_seg = PaddedCSR(
                            idx=csr.idx[a:b, :kseg],
                            mask=csr.mask[a:b, :kseg],
                        )
                        keep_seg = (
                            postgather.prng_dropout_seed(
                                jax.random.fold_in(rng, 1 + si)
                            )
                            if dropout_on else keep  # (1,1,H) sentinel
                        )
                        outs.append(postgather.gatv2_edge_stage_pallas(
                            xl, xr[a:b], att[0], keep_seg,
                            csr_seg, csr_seg_t, cfg,
                        ))
                    csr_hi = PaddedCSR(
                        idx=csr.idx[n_tail:], mask=csr.mask[n_tail:]
                    )
                    keep_hi = (
                        postgather.prng_dropout_seed(
                            jax.random.fold_in(rng, 1 + len(segs))
                        )
                        if dropout_on else keep
                    )
                    outs.append(postgather.gatv2_edge_stage_pallas(
                        xl, xr[n_tail:], att[0], keep_hi,
                        csr_hi, csr_hi_t, cfg,
                    ))
                    return jnp.concatenate(outs, axis=0) + bias

                if csr_t is not None and postgather.supported(
                    csr, h * c, h
                ):
                    out = postgather.gatv2_edge_stage_pallas(
                        xl, xr, att[0], keep, csr, csr_t, cfg,
                    )
                    return out + bias

            # XLA flat-layout path (non-TPU backends / unsupported shapes)
            from ..ops.edge_stage import gatv2_edge_stage_flat

            if dropout_on:
                rng = self.make_rng("dropout")

            def _flat_keep(shape_csr, salt):
                if dropout_on:
                    return jax.random.bernoulli(
                        jax.random.fold_in(rng, salt),
                        1.0 - self.dropout, (*shape_csr.idx.shape, h),
                    ).astype(xl.dtype) / (1.0 - self.dropout)
                return jnp.ones((*shape_csr.idx.shape, h), xl.dtype)

            if split is not None:
                segs, n_tail, csr_hi_t = split
                pieces = list(segs) + [
                    (n_tail, csr.idx.shape[0], csr.idx.shape[1],
                     csr_hi_t)
                ]
                outs = []
                for si, (a, b, kseg, csr_seg_t) in enumerate(pieces):
                    csr_seg = PaddedCSR(
                        idx=csr.idx[a:b, :kseg],
                        mask=csr.mask[a:b, :kseg],
                    )
                    outs.append(gatv2_edge_stage_flat(
                        xl, xr[a:b], att[0],
                        _flat_keep(csr_seg, 1 + si),
                        csr_seg, csr_seg_t, (h, self.negative_slope),
                    ))
                return jnp.concatenate(outs, axis=0) + bias

            out = gatv2_edge_stage_flat(
                xl, xr, att[0], _flat_keep(csr, 0), csr, csr_t,
                (h, self.negative_slope),
            )
            return out + bias

        g = jnp.take(xl, csr.idx, axis=0, mode="clip")
        s = g + xr[:, None, :]
        s = nn.leaky_relu(s, self.negative_slope)
        s = s.reshape(*s.shape[:-1], h, c)
        logits = (s * att[None]).sum(-1)  # (N_dst, K, H)

        alpha = csr_softmax(logits, csr)  # masked row softmax
        # attention introspection: the padded-CSR analogue of the
        # reference's forward-hook capture (ist_encoder.py:137-158);
        # retrieve via capture_intermediates / mutable=['intermediates']
        self.sow("intermediates", "attention", alpha)
        if self.dropout > 0.0 and not deterministic:
            alpha = nn.Dropout(rate=self.dropout, deterministic=False)(alpha)

        gh = g.reshape(*g.shape[:-1], h, c)  # (N_dst, K, H, C)
        out = jnp.einsum("nkh,nkhc->nhc", alpha, gh)
        out = out.reshape(out.shape[0], h * c) + bias
        return out
