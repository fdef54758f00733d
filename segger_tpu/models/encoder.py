"""ISTEncoder: heterogeneous GATv2 stack embedding transcripts and cells
into a shared metric space.

Architecture matches the reference's ``ISTEncoder``
(src/segger/models/ist_encoder.py:214-333):

  - first layer: gene ``Embedding`` for tx, ``Dense`` for bd -> in_channels
  - optional concat of 2D sinusoidal positional embedding (+in_channels)
  - GELU, then (2 + n_mid_layers) hetero GATv2 layers, GELU after each
  - per-type ``Dense`` to out_channels, optional L2 normalization

Each hetero layer (the reference's ``SkipGAT``, ist_encoder.py:82-134)
runs a GATv2 conv per edge type and sums results per destination type.
Parity quirk preserved: the reference registers a tx->bd conv on the
*supervision* ('belongs') edges and a bd->tx conv that never receives
edges at runtime (SURVEY Appendix) — so by default messages flow
tx->tx (neighbors) and tx->bd (belongs) only; ``use_bd_to_tx`` enables
the dormant third conv for experimentation.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..data.graph import TileGraph
from .gatv2 import GATv2Conv
from .positional import Positional2dEmbedder


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize with torch.nn.functional.normalize semantics
    (zero vectors stay zero) and a NaN-free gradient at x=0.

    ``x / max(|x|, eps)`` alone has a NaN gradient at exactly zero in JAX
    (0/0 inside the norm's chain rule); clamping under the sqrt and
    selecting the zero branch with ``where`` makes both value and grad
    exact.
    """
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return jnp.where(sq > eps * eps, x / norm, 0.0)


def torch_linear_bias_init(fan_in: int):
    """torch.nn.Linear default bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in)).

    The reference's final per-type projection is a torch Linear
    (HeteroDictLinear, ist_encoder.py:282-286) whose nonzero bias keeps
    isolated nodes off the exact-zero embedding; we match it."""
    import jax

    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


class DenseGradEmbed(nn.Module):
    """Embedding lookup with a matmul backward (parameter layout matches
    ``nn.Embed``: a single 'embedding' table, so pretrained installs and
    checkpoints are interchangeable)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        from ..ops.embed import embed_lookup

        table = self.param(
            "embedding",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.features),
        )
        return embed_lookup(table, ids.astype(jnp.int32))


class HeteroGATLayer(nn.Module):
    """One SkipGAT-equivalent layer: per-edge-type GATv2, summed per
    destination node type (HeteroConv aggr='sum',
    ist_encoder.py:109-134)."""

    out_channels: int
    heads: int
    dropout: float = 0.2
    add_self_loops_tx: bool = False  # parity: reference default is False
    use_bd_to_tx: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x_tx: jnp.ndarray,
        x_bd: jnp.ndarray,
        tile: TileGraph,
        deterministic: bool = True,
        x_tx_src: jnp.ndarray | None = None,
        x_bd_src: jnp.ndarray | None = None,
        capture_attention: bool = False,
    ):
        """``x_tx_src``/``x_bd_src`` override the *source* feature arrays
        (e.g. halo-extended copies in distributed execution); destination
        features stay local.  ``capture_attention`` forces the unfused
        conv path so attention coefficients are sown."""
        if x_tx_src is None:
            x_tx_src = x_tx
        if x_bd_src is None:
            x_bd_src = x_bd
        conv_tt = GATv2Conv(
            self.out_channels, self.heads, dropout=self.dropout,
            dtype=self.dtype, name="tt"
        )
        conv_tb = GATv2Conv(
            self.out_channels, self.heads, dropout=self.dropout,
            dtype=self.dtype, name="tb"
        )
        # transpose tables apply when sources == local destinations, or
        # when the tile's tables are built for the extended halo space
        # (transposes_extended: distributed training keeps the fast
        # transpose-space backward)
        same_src = x_tx_src is x_tx
        use_t = same_src or tile.transposes_extended
        # degree-bucketed fused edge stage (apply_degree_bucketing):
        # narrow kernel on the low-in-degree leading rows
        split = None
        if (
            use_t
            and tile.tt_n_lo > 0
            and tile.tt_lo_t is not None
            and tile.tt_hi_t is not None
        ):
            # narrow-kernel segments (row ranges + widths + transpose
            # tables), then the full-width tail from tt_n_lo
            if tile.tt_n_xlo > 0 and tile.tt_xlo_t is not None:
                segs = (
                    (0, tile.tt_n_xlo, tile.tt_k_xlo, tile.tt_xlo_t),
                    (tile.tt_n_xlo, tile.tt_n_lo, tile.tt_k_lo,
                     tile.tt_lo_t),
                )
            else:
                segs = ((0, tile.tt_n_lo, tile.tt_k_lo, tile.tt_lo_t),)
            split = (segs, tile.tt_n_lo, tile.tt_hi_t)
        out_tx = conv_tt(
            x_tx_src, x_tx, tile.tt, deterministic,
            csr_t=tile.tt_t if use_t else None,
            capture_attention=capture_attention,
            split=split,
        )
        out_bd = conv_tb(
            x_tx_src, x_bd, tile.tb, deterministic,
            csr_t=tile.tb_t if use_t else None,
            capture_attention=capture_attention,
        )
        if self.use_bd_to_tx and tile.bt is not None:
            conv_bt = GATv2Conv(
                self.out_channels, self.heads, dropout=self.dropout,
                dtype=self.dtype, name="bt"
            )
            out_tx = out_tx + conv_bt(
                x_bd_src, x_tx, tile.bt, deterministic,
                capture_attention=capture_attention,
            )
        return out_tx, out_bd


class ISTEncoder(nn.Module):
    n_genes: int
    in_channels: int = 16
    hidden_channels: int = 32
    out_channels: int = 32
    n_mid_layers: int = 3
    n_heads: int = 3
    normalize_embeddings: bool = True
    use_positional_embeddings: bool = True
    use_bd_to_tx: bool = False
    attn_dropout: float = 0.2
    dtype: jnp.dtype | None = None  # compute dtype (e.g. jnp.bfloat16);
                                    # params stay float32

    @nn.compact
    def __call__(
        self,
        tile: TileGraph,
        deterministic: bool = True,
        exchange=None,
        pos_prenormalized: bool = False,
        capture_attention: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """``exchange``: optional callback ``(x_tx, x_bd) -> (x_tx_src,
        x_bd_src)`` invoked before every conv layer.  In distributed
        execution it performs the per-layer halo exchange (ppermute of
        boundary-node features) and returns halo-extended sources —
        each either one array or a tuple of pieces ``(local, from_left,
        from_right)`` that the conv projects piecewise so the ppermute
        overlaps the local matmul (parallel/halo.py::_exchange_1d);
        locally it is None and sources == destinations.
        ``pos_prenormalized``: coordinates are already in [0, 1].
        ``capture_attention``: use the unfused conv path everywhere so
        per-layer attention coefficients appear under
        ``intermediates`` (retrieve via ``mutable=['intermediates']``)."""
        # First projection: gene embedding lookup / bd linear
        # (ist_encoder.py:258-263,312).  Lookup uses the matmul-backward
        # embed op (scatters serialize on TPU; ops/embed.py)
        gene_emb = DenseGradEmbed(
            self.n_genes, self.in_channels, name="gene_embedding"
        )
        bd_lin = nn.Dense(self.in_channels, name="bd_linear")
        x_tx = gene_emb(tile.tx_gene.astype(jnp.int32))
        x_bd = bd_lin(tile.bd_x)

        if self.use_positional_embeddings:
            pos_emb = Positional2dEmbedder(self.in_channels, name="pos_emb")
            x_tx = jnp.concatenate(
                [x_tx,
                 pos_emb(tile.tx_pos, tile.tx_valid, pos_prenormalized)],
                axis=-1,
            )
            x_bd = jnp.concatenate(
                [x_bd,
                 pos_emb(tile.bd_pos, tile.bd_valid, pos_prenormalized)],
                axis=-1,
            )

        # exact (erf) GELU: torch F.gelu's default, used by the reference
        # (ist_encoder.py:321,327); flax's default is the tanh approximation
        x_tx, x_bd = nn.gelu(x_tx, approximate=False), nn.gelu(
            x_bd, approximate=False
        )
        self.sow("intermediates", "embed_tx", x_tx)
        self.sow("intermediates", "embed_bd", x_bd)

        # Conv stack: in -> hidden x heads -> ... -> out x heads
        # (ist_encoder.py:267-280)
        widths = (
            [self.hidden_channels] * (1 + self.n_mid_layers)
            + [self.out_channels]
        )
        for i, w in enumerate(widths):
            layer = HeteroGATLayer(
                out_channels=w,
                heads=self.n_heads,
                dropout=self.attn_dropout,
                use_bd_to_tx=self.use_bd_to_tx,
                dtype=self.dtype,
                name=f"conv_{i}",
            )
            if exchange is not None:
                x_tx_src, x_bd_src = exchange(x_tx, x_bd)
            else:
                x_tx_src, x_bd_src = None, None
            x_tx, x_bd = layer(
                x_tx, x_bd, tile, deterministic,
                x_tx_src=x_tx_src, x_bd_src=x_bd_src,
                capture_attention=capture_attention,
            )
            # per-layer post-conv (pre-GELU) activations for parity
            # checks / introspection (mutable=['intermediates'])
            self.sow("intermediates", f"layer{i}_tx", x_tx)
            self.sow("intermediates", f"layer{i}_bd", x_bd)
            x_tx, x_bd = nn.gelu(x_tx, approximate=False), nn.gelu(
                x_bd, approximate=False
            )

        # Final per-type projection (HeteroDictLinear, ist_encoder.py:282-286)
        fan = x_tx.shape[-1]
        x_tx = nn.Dense(
            self.out_channels,
            bias_init=torch_linear_bias_init(fan),
            name="lin_last_tx",
        )(x_tx)
        x_bd = nn.Dense(
            self.out_channels,
            bias_init=torch_linear_bias_init(fan),
            name="lin_last_bd",
        )(x_bd)

        if self.normalize_embeddings:
            x_tx = safe_normalize(x_tx)
            x_bd = safe_normalize(x_bd)
        return {"tx": x_tx, "bd": x_bd}
