"""2-D grid halo-exchange tests: the (4, 2) grid-sharded whole-slide
forward and training gradients must reproduce the single-device
full-graph computation exactly, including corner (diagonal-neighbour)
edges relayed through the two-stage exchange (SURVEY §4.3 analogue of
tests/test_halo.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.models import ISTEncoder
from segger_tpu.parallel.grid import (
    build_grid_sharded_graph,
    make_grid_mesh,
    make_grid_train_step,
    grid_predict,
    _tx_exchange,
    _bd_exchange,
)
from segger_tpu.ops import csr_gather, csr_max

from test_halo import full_graph_tile

DX, DY = 4, 2


@pytest.fixture(scope="module")
def graph():
    s = make_synthetic(n_cells=150, n_genes=30, mean_tx_per_cell=20,
                       seed=3)
    cfg = PipelineConfig(
        cells_embedding_size=12,
        genes_min_counts=10,
        cells_min_counts=5,
        prediction_graph_mode="uniform",
        prediction_graph_max_k=4,
    )
    p = ISTPipeline(s.transcripts, s.boundaries, s.polygons, cfg).load()
    return p.graph


@pytest.fixture(scope="module")
def model_and_params(graph):
    model = ISTEncoder(
        n_genes=graph.n_genes,
        in_channels=graph.gene_embedding.shape[1],
        hidden_channels=16, out_channels=16, n_mid_layers=1, n_heads=2,
    )
    tile = full_graph_tile(graph)
    params = model.init(jax.random.PRNGKey(0), tile)
    return model, params, tile


def test_build_grid_partition(graph):
    stacked, halo, dropped = build_grid_sharded_graph(graph, DX, DY)
    idx = np.asarray(stacked.tx_index)
    valid = np.asarray(stacked.tx_valid)
    owned = idx[valid]
    assert owned.size == graph.n_tx
    assert len(np.unique(owned)) == graph.n_tx
    # nothing further than one grid step (cells are wide vs kNN radius)
    assert dropped[0] == 0 and dropped[1] == 0
    assert int(np.asarray(stacked.tt.mask).sum()) == graph.tt_src.size
    # the 2-D decomposition actually exercises the y stage
    assert bool(np.asarray(halo.tx_send_yu_mask).any())


def test_grid_predict_matches_single_device(graph, model_and_params):
    model, params, tile = model_and_params

    emb = model.apply(params, tile, pos_prenormalized=True)
    g = csr_gather(emb["bd"], tile.cand)
    tx = emb["tx"]
    num = jnp.einsum("nf,nkf->nk", tx, g)
    ntx = jnp.sqrt(jnp.maximum((tx * tx).sum(-1, keepdims=True), 1e-16))
    ng = jnp.sqrt(jnp.maximum((g * g).sum(-1), 1e-16))
    max_sim, arg = csr_max(num / (ntx * ng), tile.cand)
    seg_ref = np.where(
        np.asarray(arg) >= 0,
        np.asarray(tile.bd_index)[np.asarray(arg)], -1,
    )
    sim_ref = np.asarray(max_sim)

    mesh = make_grid_mesh(DX, DY)
    preds = grid_predict(model, params, graph, mesh)

    order = np.argsort(preds["row_index"])
    rows = preds["row_index"][order]
    np.testing.assert_array_equal(rows, np.asarray(tile.tx_index))
    np.testing.assert_array_equal(preds["cell_encoding"][order], seg_ref)
    np.testing.assert_allclose(
        preds["similarity"][order], sim_ref, rtol=1e-4, atol=1e-5
    )


def test_grid_embeddings_match_exactly(graph, model_and_params):
    """Layer outputs themselves agree (not just argmaxes)."""
    model, params, tile = model_and_params
    emb_ref = model.apply(params, tile, pos_prenormalized=True)

    mesh = make_grid_mesh(DX, DY)
    stacked, halo, _ = build_grid_sharded_graph(graph, DX, DY)
    sharding = NamedSharding(mesh, P(("x", "y")))
    stacked_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
    halo_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), halo
    )

    def device_fn(t, h):
        t = jax.tree.map(lambda x: x[0], t)
        h = jax.tree.map(lambda x: x[0], h)
        ex_tx = _tx_exchange(h, "x", "y", DX, DY)
        ex_bd = _bd_exchange(h, "x", "y", DX, DY)
        e = model.apply(
            params, t, deterministic=True,
            exchange=lambda a, b: (ex_tx(a), ex_bd(b)),
            pos_prenormalized=True,
        )
        return e["tx"][None], t.tx_index[None], t.tx_valid[None]

    fn = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P(("x", "y")), P(("x", "y"))),
        out_specs=P(("x", "y")),
    ))
    e_tx, idx, valid = jax.tree.map(np.asarray, fn(stacked_d, halo_d))
    e_tx = e_tx.reshape(-1, e_tx.shape[-1])
    idx, valid = idx.ravel(), valid.ravel()
    got = e_tx[valid][np.argsort(idx[valid])]
    np.testing.assert_allclose(
        got, np.asarray(emb_ref["tx"]), rtol=2e-4, atol=1e-5
    )


def test_grid_training_grads_match_single_device(graph, model_and_params):
    """Deterministic surrogate loss (see test_halo_train.py): node term
    over owned transcripts + link term through the final exchange, so
    gradients cross both ppermute stages in both directions."""
    model, params, tile = model_and_params

    sg_src = jnp.asarray(graph.sg_src)
    sg_dst = jnp.asarray(graph.sg_dst)

    def loss_single(p):
        emb = model.apply(p, tile, pos_prenormalized=True)
        l_node = (emb["tx"] ** 2).sum(-1).mean()
        link = (emb["tx"][sg_src] * emb["bd"][sg_dst]).sum(-1)
        return l_node + link.mean()

    g_ref = jax.grad(loss_single)(params)

    mesh = make_grid_mesh(DX, DY)
    stacked, halo, dropped = build_grid_sharded_graph(
        graph, DX, DY, for_training=True
    )
    assert not dropped.any()
    assert stacked.transposes_extended
    sharding = NamedSharding(mesh, P(("x", "y")))
    stacked_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
    halo_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), halo
    )

    def device_grads(p, t, h):
        t = jax.tree.map(lambda x: x[0], t)
        h = jax.tree.map(lambda x: x[0], h)
        ex_tx = _tx_exchange(h, "x", "y", DX, DY)
        ex_bd = _bd_exchange(h, "x", "y", DX, DY)

        def loss_fn(p):
            emb = model.apply(
                p, t, deterministic=True,
                exchange=lambda a, b: (ex_tx(a), ex_bd(b)),
                pos_prenormalized=True,
            )
            v = t.tx_valid
            s1 = jnp.where(v, (emb["tx"] ** 2).sum(-1), 0.0).sum()
            c1 = v.sum().astype(jnp.float32)
            x_tx_ext = jnp.concatenate(ex_tx(emb["tx"]), axis=0)
            link = (x_tx_ext[t.sg_src] * emb["bd"][t.sg_dst]).sum(-1)
            s2 = jnp.where(t.sg_mask, link, 0.0).sum()
            c2 = t.sg_mask.sum().astype(jnp.float32)
            counts = jax.lax.stop_gradient(
                jax.lax.psum(jnp.stack([c1, c2]), ("x", "y"))
            )
            return s1 / counts[0] + s2 / counts[1]

        grads = jax.grad(loss_fn)(p)
        return jax.lax.psum(grads, ("x", "y"))

    fn = jax.jit(jax.shard_map(
        device_grads, mesh=mesh,
        in_specs=(P(), P(("x", "y")), P(("x", "y"))), out_specs=P(),
        check_vma=False,
    ))
    g_shard = fn(params, stacked_d, halo_d)

    flat_ref, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_shard, _ = jax.flatten_util.ravel_pytree(g_shard)
    scale = float(jnp.abs(flat_ref).max()) + 1e-12
    np.testing.assert_allclose(
        np.asarray(flat_shard) / scale, np.asarray(flat_ref) / scale,
        atol=5e-5,
    )


def test_trainer_grid_whole_slide(graph):
    """SeggerTrainer fit_whole_slide/predict_whole_slide with
    grid=(dx, dy) end-to-end."""
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig

    tr = SeggerTrainer(
        graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=2, seed=0),
    )
    history = tr.fit_whole_slide(grid=(DX, DY), max_epochs=2)
    assert len(history) == 2
    assert all(np.isfinite([h["train:loss"] for h in history]))
    preds = tr.predict_whole_slide(grid=(DX, DY))
    assert len(preds["row_index"]) == graph.n_tx
    assert len(np.unique(preds["row_index"])) == graph.n_tx


def test_grid_train_step_runs_and_learns(graph, model_and_params):
    """Production losses: optimizer steps over the grid stay finite and
    move the loss."""
    import optax

    model, params, _ = model_and_params
    mesh = make_grid_mesh(DX, DY)
    stacked, halo, _ = build_grid_sharded_graph(
        graph, DX, DY, for_training=True
    )
    sharding = NamedSharding(mesh, P(("x", "y")))
    stacked_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
    halo_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), halo
    )
    opt = optax.adam(1e-3)
    step = make_grid_train_step(
        model, opt, mesh,
        jnp.asarray(graph.tx_similarity), jnp.asarray(graph.bd_similarity),
    )
    opt_state = opt.init(params)
    weights = jnp.ones(3)
    losses = []
    p = params
    for i in range(3):
        p, opt_state, loss, _ = step(
            p, opt_state, stacked_d, halo_d, jax.random.PRNGKey(i),
            weights,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] != losses[0]
