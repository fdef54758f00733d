"""Cross-framework parity: the JAX encoder against a PyTorch
re-statement of the reference model's math.

The BASELINE target is per-layer activation parity with the reference
PyG model; PyG is not installed here, so the reference semantics
(PyG GATv2Conv + HeteroConv sum + the ISTEncoder pipeline,
src/segger/models/ist_encoder.py) are restated in plain torch with
weights copied from the flax parameters.  Agreement across frameworks
rules out layout/dtype/math drift that a same-framework reference
cannot."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from segger_tpu.models import ISTEncoder
from tests.test_model import make_tile


def torch_gatv2(x_src, x_dst, edge_src, edge_dst, p, heads, ch):
    """PyG GATv2Conv forward in plain torch (share_weights=False,
    concat=True, negative_slope=0.2)."""
    dt = torch.float64
    Wl = torch.tensor(np.asarray(p["lin_l"]["kernel"]), dtype=dt)
    bl = torch.tensor(np.asarray(p["lin_l"]["bias"]), dtype=dt)
    Wr = torch.tensor(np.asarray(p["lin_r"]["kernel"]), dtype=dt)
    br = torch.tensor(np.asarray(p["lin_r"]["bias"]), dtype=dt)
    att = torch.tensor(np.asarray(p["att"][0]), dtype=dt)  # (H, C)
    bias = torch.tensor(np.asarray(p["bias"]), dtype=dt)

    xl = x_src @ Wl + bl
    xr = x_dst @ Wr + br
    n_dst = x_dst.shape[0]
    out = torch.zeros(n_dst, heads, ch, dtype=torch.float64)
    s = xl[edge_src] + xr[edge_dst]
    s = torch.nn.functional.leaky_relu(s, 0.2)
    s = s.view(-1, heads, ch)
    logits = (s * att).sum(-1)  # (E, H)
    # per-destination segment softmax
    alpha = torch.zeros_like(logits)
    for i in range(n_dst):
        sel = edge_dst == i
        if sel.any():
            alpha[sel] = torch.softmax(logits[sel], dim=0)
    gh = xl[edge_src].view(-1, heads, ch)
    for e in range(edge_src.shape[0]):
        out[edge_dst[e]] += alpha[e].unsqueeze(-1) * gh[e]
    return out.reshape(n_dst, heads * ch) + bias


def torch_sinusoidal(x, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period)
        * torch.arange(half, dtype=torch.float64) / half
    )
    args = x[..., None] * freqs
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def torch_reference_forward(tile, params, heads, hidden, out_ch,
                            n_mid, in_ch):
    """The reference ISTEncoder pipeline (ist_encoder.py:289-333) in
    torch, numerically in float64."""
    p = jax.tree.map(np.asarray, params["params"])
    t = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)

    emb_tbl = torch.tensor(
        np.asarray(p["gene_embedding"]["embedding"]), dtype=torch.float64
    )
    x_tx = emb_tbl[t(tile.tx_gene).long()]
    x_bd = t(tile.bd_x) @ torch.tensor(
        np.asarray(p["bd_linear"]["kernel"]), dtype=torch.float64
    ) + torch.tensor(np.asarray(p["bd_linear"]["bias"]),
                     dtype=torch.float64)

    # positional embedding, per-tile masked min/max normalization
    def pos_emb(pos, valid):
        pos = t(pos)
        vm = torch.tensor(np.asarray(valid))
        mins = pos[vm].min(0).values
        maxs = pos[vm].max(0).values
        pn = (pos - mins) / (maxs - mins + 1e-8)
        freq = torch_sinusoidal(pn, 256)
        W0 = torch.tensor(
            np.asarray(p["pos_emb"]["Dense_0"]["kernel"]),
            dtype=torch.float64,
        )
        b0 = torch.tensor(
            np.asarray(p["pos_emb"]["Dense_0"]["bias"]),
            dtype=torch.float64,
        )
        W1 = torch.tensor(
            np.asarray(p["pos_emb"]["Dense_1"]["kernel"]),
            dtype=torch.float64,
        )
        b1 = torch.tensor(
            np.asarray(p["pos_emb"]["Dense_1"]["bias"]),
            dtype=torch.float64,
        )
        h = torch.nn.functional.silu(freq @ W0 + b0) @ W1 + b1
        return h.reshape(h.shape[0], -1)

    x_tx = torch.cat([x_tx, pos_emb(tile.tx_pos, tile.tx_valid)], -1)
    x_bd = torch.cat([x_bd, pos_emb(tile.bd_pos, tile.bd_valid)], -1)
    gelu = torch.nn.functional.gelu
    x_tx, x_bd = gelu(x_tx), gelu(x_bd)

    # edge lists from the padded tables
    def coo(csr):
        idx = np.asarray(csr.idx)
        mask = np.asarray(csr.mask)
        rows = np.repeat(np.arange(idx.shape[0]), idx.shape[1]).reshape(
            idx.shape
        )
        return (
            torch.tensor(idx[mask].astype(np.int64)),
            torch.tensor(rows[mask].astype(np.int64)),
        )

    tt_src, tt_dst = coo(tile.tt)
    tb_src, tb_dst = coo(tile.tb)

    widths = [hidden] * (1 + n_mid) + [out_ch]
    ch = None
    for i, w in enumerate(widths):
        conv = p[f"conv_{i}"]
        x_tx_new = torch_gatv2(
            x_tx, x_tx, tt_src, tt_dst, conv["tt"], heads, w
        )
        x_bd_new = torch_gatv2(
            x_tx, x_bd, tb_src, tb_dst, conv["tb"], heads, w
        )
        x_tx, x_bd = gelu(x_tx_new), gelu(x_bd_new)

    def lin_last(x, name):
        W = torch.tensor(np.asarray(p[name]["kernel"]),
                         dtype=torch.float64)
        b = torch.tensor(np.asarray(p[name]["bias"]),
                         dtype=torch.float64)
        return x @ W + b

    x_tx = lin_last(x_tx, "lin_last_tx")
    x_bd = lin_last(x_bd, "lin_last_bd")
    x_tx = torch.nn.functional.normalize(x_tx, dim=-1)
    x_bd = torch.nn.functional.normalize(x_bd, dim=-1)
    return x_tx, x_bd


def test_encoder_matches_torch_reference(rng):
    tile = make_tile(rng, n_tx=50, n_bd=8, n_genes=10, f_bd=6)
    heads, hidden, out_ch, n_mid, in_ch = 2, 8, 8, 1, 8
    model = ISTEncoder(
        n_genes=10, in_channels=in_ch, hidden_channels=hidden,
        out_channels=out_ch, n_mid_layers=n_mid, n_heads=heads,
    )
    params = model.init(jax.random.PRNGKey(3), tile)
    got = model.apply(params, tile)

    want_tx, want_bd = torch_reference_forward(
        tile, params, heads, hidden, out_ch, n_mid, in_ch
    )
    np.testing.assert_allclose(
        np.asarray(got["tx"]), want_tx.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["bd"]), want_bd.numpy(), rtol=1e-3, atol=1e-4
    )
