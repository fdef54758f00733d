"""Reference-quirk parity tests (SURVEY Appendix): behaviors of the
reference that look like bugs but must be preserved for parity."""
import numpy as np
import jax
import jax.numpy as jnp

from segger_tpu.models import ISTEncoder
from tests.test_model import make_tile


def test_bd_features_do_not_influence_tx(rng):
    """The reference defines a bd->tx conv that never receives edges
    (SkipGAT registers it, the data never carries the edge type) — so
    transcript embeddings are independent of boundary features."""
    tile = make_tile(rng)
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=1, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    out1 = model.apply(params, tile)
    perturbed = tile.replace(
        bd_x=tile.bd_x + 10.0,
        bd_pos=tile.bd_pos + 3.0,
    )
    out2 = model.apply(params, perturbed)
    np.testing.assert_allclose(
        np.asarray(out1["tx"]), np.asarray(out2["tx"]), atol=1e-6
    )


def test_supervision_edges_carry_messages(rng):
    """The tx->bd conv runs on the 'belongs' (supervision) edges
    (ist_encoder.py:118): changing which transcripts belong to a cell
    changes that cell's embedding."""
    tile = make_tile(rng)
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=0, n_heads=1,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    out1 = model.apply(params, tile)
    # drop all supervision edges: bd nodes become isolated
    empty_tb = tile.tb.replace(mask=jnp.zeros_like(tile.tb.mask))
    out2 = model.apply(params, tile.replace(tb=empty_tb))
    assert not np.allclose(
        np.asarray(out1["bd"]), np.asarray(out2["bd"]), atol=1e-3
    )


def test_use_bd_to_tx_enables_dormant_conv(rng):
    """With use_bd_to_tx=True and a bt adjacency, bd features reach tx."""
    from segger_tpu.ops import coo_to_padded_csr

    tile = make_tile(rng)
    n_tx = tile.tx_gene.shape[0]
    bt = coo_to_padded_csr(
        np.arange(n_tx) % n_tx, np.arange(n_tx) % 10, n_dst=n_tx, k=4
    )
    tile_bt = tile.replace(bt=jax.tree.map(jnp.asarray, bt))
    model = ISTEncoder(
        n_genes=12, in_channels=8, hidden_channels=8, out_channels=8,
        n_mid_layers=0, n_heads=1, use_bd_to_tx=True,
    )
    params = model.init(jax.random.PRNGKey(0), tile_bt)
    out1 = model.apply(params, tile_bt)
    out2 = model.apply(
        params, tile_bt.replace(bd_x=tile_bt.bd_x + 5.0)
    )
    assert not np.allclose(
        np.asarray(out1["tx"]), np.asarray(out2["tx"]), atol=1e-3
    )


def test_prediction_unassigned_contract(rng):
    """Empty candidate rows yield cell encoding -1 (the reference's
    scatter_max out-of-range contract, lightning_model.py:286-293)."""
    from segger_tpu.ops import csr_max, PaddedCSR

    sims = jnp.asarray(np.ones((3, 2), np.float32))
    cand = PaddedCSR(
        idx=jnp.asarray(np.zeros((3, 2), np.int32)),
        mask=jnp.asarray(
            np.array([[True, False], [False, False], [True, True]])
        ),
    )
    _, arg = csr_max(sims, cand)
    assert int(arg[1]) == -1
    assert int(arg[0]) >= 0 and int(arg[2]) >= 0
