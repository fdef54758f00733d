"""Model tests: GATv2 math vs dense reference, encoder shape/contract tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.ops import coo_to_padded_csr
from segger_tpu.models import GATv2Conv, ISTEncoder
from segger_tpu.data.graph import TileGraph


def dense_gatv2_reference(x_src, x_dst, dst, src, params, heads, out_ch, slope=0.2):
    """Straight-line numpy implementation of PyG GATv2Conv semantics
    (share_weights=False, concat=True)."""
    Wl, bl = params["lin_l"]["kernel"], params["lin_l"]["bias"]
    Wr, br = params["lin_r"]["kernel"], params["lin_r"]["bias"]
    att = params["att"][0]  # (H, C)
    bias = params["bias"]
    xl = x_src @ Wl + bl
    xr = x_dst @ Wr + br
    n_dst = x_dst.shape[0]
    out = np.zeros((n_dst, heads, out_ch), dtype=np.float64)
    for i in range(n_dst):
        edges = np.where(dst == i)[0]
        if edges.size == 0:
            continue
        js = src[edges]
        s = xl[js] + xr[i]  # (E_i, H*C)
        s = np.where(s > 0, s, slope * s)
        s = s.reshape(-1, heads, out_ch)
        logits = (s * att).sum(-1)  # (E_i, H)
        logits = logits - logits.max(0)
        a = np.exp(logits) / np.exp(logits).sum(0)
        gh = xl[js].reshape(-1, heads, out_ch)
        out[i] = np.einsum("eh,ehc->hc", a, gh)
    return out.reshape(n_dst, heads * out_ch) + bias


@pytest.mark.parametrize("heads,out_ch", [(1, 8), (3, 5)])
def test_gatv2_matches_dense_reference(rng, heads, out_ch):
    n_src, n_dst, f_in, e = 20, 14, 7, 80
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    pairs = np.unique(np.stack([dst, src], 1), axis=0)
    dst, src = pairs[:, 0], pairs[:, 1]
    x_src = rng.normal(size=(n_src, f_in)).astype(np.float32)
    x_dst = rng.normal(size=(n_dst, f_in)).astype(np.float32)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)

    conv = GATv2Conv(out_channels=out_ch, heads=heads)
    params = conv.init(
        jax.random.PRNGKey(0), jnp.asarray(x_src), jnp.asarray(x_dst), csr
    )
    got = np.asarray(
        conv.apply(params, jnp.asarray(x_src), jnp.asarray(x_dst), csr)
    )
    p = jax.tree.map(np.asarray, params["params"])
    want = dense_gatv2_reference(x_src, x_dst, dst, src, p, heads, out_ch)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gatv2_isolated_dst_gets_bias(rng):
    """Destinations with no in-edges output exactly the bias term."""
    n_src, n_dst, f_in = 5, 4, 3
    dst = np.array([0, 0, 2])
    src = np.array([1, 3, 0])
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    x_src = rng.normal(size=(n_src, f_in)).astype(np.float32)
    x_dst = rng.normal(size=(n_dst, f_in)).astype(np.float32)
    conv = GATv2Conv(out_channels=6, heads=2)
    params = conv.init(
        jax.random.PRNGKey(1), jnp.asarray(x_src), jnp.asarray(x_dst), csr
    )
    out = np.asarray(
        conv.apply(params, jnp.asarray(x_src), jnp.asarray(x_dst), csr)
    )
    bias = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(out[1], bias, atol=1e-6)
    np.testing.assert_allclose(out[3], bias, atol=1e-6)


def make_tile(rng, n_tx=60, n_bd=10, n_genes=12, f_bd=8, k_tt=5, k_tb=16, k_c=4):
    tt_dst = np.repeat(np.arange(n_tx), k_tt)
    tt_src = rng.integers(0, n_tx, n_tx * k_tt)
    bd_of_tx = rng.integers(0, n_bd, n_tx)
    sg_mask = rng.uniform(size=n_tx) < 0.5
    sg_src = np.arange(n_tx)[sg_mask]
    sg_dst = bd_of_tx[sg_mask]
    cand_dst = np.repeat(np.arange(n_tx), k_c)
    cand_src = rng.integers(0, n_bd, n_tx * k_c)
    esg = n_tx  # padded supervision length

    tile = TileGraph(
        tx_gene=rng.integers(0, n_genes, n_tx).astype(np.int32),
        tx_pos=rng.uniform(0, 100, (n_tx, 2)).astype(np.float32),
        tx_cluster=rng.integers(0, 4, n_tx).astype(np.int32),
        tx_index=np.arange(n_tx, dtype=np.int32),
        tx_valid=np.ones(n_tx, bool),
        tx_interior=rng.uniform(size=n_tx) < 0.8,
        bd_x=rng.normal(size=(n_bd, f_bd)).astype(np.float32),
        bd_pos=rng.uniform(0, 100, (n_bd, 2)).astype(np.float32),
        bd_cluster=rng.integers(0, 3, n_bd).astype(np.int32),
        bd_index=np.arange(n_bd, dtype=np.int32),
        bd_valid=np.ones(n_bd, bool),
        bd_interior=np.ones(n_bd, bool),
        tt=coo_to_padded_csr(tt_dst, tt_src, n_dst=n_tx, k=k_tt),
        tb=coo_to_padded_csr(sg_dst, sg_src, n_dst=n_bd, k=k_tb),
        cand=coo_to_padded_csr(cand_dst, cand_src, n_dst=n_tx, k=k_c),
        sg_src=np.pad(sg_src, (0, esg - sg_src.size)).astype(np.int32),
        sg_dst=np.pad(sg_dst, (0, esg - sg_dst.size)).astype(np.int32),
        sg_mask=np.pad(np.ones(sg_src.size, bool), (0, esg - sg_src.size)),
    )
    return jax.tree.map(jnp.asarray, tile)


def test_encoder_forward_shapes_and_norm(rng):
    tile = make_tile(rng)
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=1, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    out = model.apply(params, tile)
    assert out["tx"].shape == (60, 8)
    assert out["bd"].shape == (10, 8)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["tx"]), axis=-1), 1.0, rtol=1e-4
    )
    # isolated bd nodes (no 'belongs' in-edges) legitimately embed to 0
    # under zero-init biases; check unit norm only for connected ones
    connected = np.asarray(tile.tb.mask).any(axis=1)
    norms = np.linalg.norm(np.asarray(out["bd"]), axis=-1)
    np.testing.assert_allclose(norms[connected], 1.0, rtol=1e-4)


def test_encoder_vmap_over_stacked_tiles(rng):
    tiles = [make_tile(rng) for _ in range(3)]
    batch = jax.tree.map(lambda *xs: jnp.stack(xs), *tiles)
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=0, n_heads=1,
    )
    params = model.init(jax.random.PRNGKey(0), tiles[0])
    out = jax.vmap(lambda t: model.apply(params, t))(batch)
    assert out["tx"].shape == (3, 60, 8)
    # per-tile result equals the unbatched run
    solo = model.apply(params, tiles[1])
    np.testing.assert_allclose(
        np.asarray(out["tx"][1]), np.asarray(solo["tx"]), rtol=2e-4, atol=2e-5
    )


def test_positional_embedding_translation_invariance(rng):
    """Tile-local normalization makes the encoder invariant to global
    translation of a tile's coordinates."""
    tile = make_tile(rng)
    shifted = tile.replace(
        tx_pos=tile.tx_pos + 1000.0, bd_pos=tile.bd_pos + 1000.0
    )
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=0, n_heads=1,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    a = model.apply(params, tile)
    b = model.apply(params, shifted)
    np.testing.assert_allclose(
        np.asarray(a["tx"]), np.asarray(b["tx"]), rtol=1e-3, atol=1e-4
    )


def test_capture_attention_on_fused_path(rng):
    """VERDICT r1 item 7: attention introspection must work in the
    default configuration (transpose tables present -> fused edge
    stage).  ``capture_attention=True`` switches to the unfused path for
    that call, sowing per-layer coefficients, and the embeddings it
    returns must match the fused forward."""
    from segger_tpu.ops import transpose_csr

    tile = make_tile(rng)
    tile = tile.replace(
        tt_t=jax.tree.map(
            jnp.asarray, transpose_csr(jax.tree.map(np.asarray, tile.tt),
                                       n_src=60)
        ),
        tb_t=jax.tree.map(
            jnp.asarray, transpose_csr(jax.tree.map(np.asarray, tile.tb),
                                       n_src=60)
        ),
    )
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=1, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    fused = model.apply(params, tile)
    unfused, state = model.apply(
        params, tile, capture_attention=True, mutable=["intermediates"]
    )
    np.testing.assert_allclose(
        np.asarray(fused["tx"]), np.asarray(unfused["tx"]),
        rtol=2e-4, atol=2e-5,
    )
    flat = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    atts = [
        np.asarray(v) for path, v in flat
        if any(getattr(p, "key", None) == "attention" for p in path)
    ]
    # 3 layers x (tt, tb) convs minimum; every alpha row sums to 1 or 0
    assert len(atts) >= 6
    for a in atts:
        rows = a.sum(axis=1)
        ok = np.isclose(rows, 1.0, atol=1e-5) | np.isclose(rows, 0.0)
        assert ok.all()


def test_forced_pallas_backend_on_cpu_interprets(rng, monkeypatch):
    """SEGGER_EDGE_STAGE=pallas on a non-TPU backend must run the
    kernels in interpret mode (not attempt a Mosaic lowering) and match
    the XLA flat path."""
    from segger_tpu.ops import transpose_csr

    tile = make_tile(rng)
    tile = tile.replace(
        tt_t=jax.tree.map(
            jnp.asarray, transpose_csr(jax.tree.map(np.asarray, tile.tt),
                                       n_src=60)
        ),
        tb_t=jax.tree.map(
            jnp.asarray, transpose_csr(jax.tree.map(np.asarray, tile.tb),
                                       n_src=60)
        ),
    )
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=1, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    monkeypatch.setenv("SEGGER_EDGE_STAGE", "xla")
    ref = model.apply(params, tile)
    monkeypatch.setenv("SEGGER_EDGE_STAGE", "pallas")
    from segger_tpu.ops.pallas import postgather

    calls = []
    real = postgather.gatv2_edge_stage_pallas

    def counting(*a, **kw):
        calls.append(a[-1])  # config tuple; [2] is interpret
        return real(*a, **kw)

    monkeypatch.setattr(postgather, "gatv2_edge_stage_pallas", counting)
    out = model.apply(params, tile)
    assert calls and all(cfg[2] is True for cfg in calls)
    np.testing.assert_allclose(
        np.asarray(out["tx"]), np.asarray(ref["tx"]),
        rtol=2e-4, atol=2e-5,
    )
