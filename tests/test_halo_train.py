"""Halo-exchange whole-slide training: gradients through ppermute.

The sharded training path (parallel/halo.py::make_sharded_train_step)
must produce the same gradients as single-device full-graph training:
per-layer exchanges are exact in the forward (test_halo.py pins that),
and their VJPs (reverse ppermute + scatter-add into owner rows) must
route every cotangent back to the owning shard exactly once.  The
deterministic-surrogate test pins this without sampling noise; the
trainer-level test exercises the production losses end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.models import ISTEncoder
from segger_tpu.parallel.mesh import make_mesh
from segger_tpu.parallel.halo import (
    build_sharded_graph,
    make_sharded_train_step,
    _exchange_1d,
)

from test_halo import full_graph_tile

N_DEV = 8


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


def test_sharded_training_grads_match_single_device(
    graph, model_and_params
):
    """Deterministic surrogate loss (no sampling): a node term over all
    owned transcripts plus a link term over all supervision edges — the
    latter reads neighbor-shard embeddings through the final exchange,
    so its gradient crosses ppermute twice (forward fetch, backward
    return)."""
    model, params, tile = model_and_params

    # ---- single device: independent code path (no transpose tables,
    # autodiff through jnp.take) ----
    sg_src = jnp.asarray(graph.sg_src)
    sg_dst = jnp.asarray(graph.sg_dst)

    def loss_single(p):
        emb = model.apply(p, tile, pos_prenormalized=True)
        l_node = (emb["tx"] ** 2).sum(-1).mean()
        link = (emb["tx"][sg_src] * emb["bd"][sg_dst]).sum(-1)
        return l_node + link.mean()

    g_ref = jax.grad(loss_single)(params)

    # ---- sharded: 8-strip mesh, per-layer + final exchange, psum'd
    # masked means, psum'd grads (extended transpose tables route the
    # edge-stage backward) ----
    mesh = make_mesh(N_DEV)
    stacked, halo, dropped = build_sharded_graph(
        graph, N_DEV, for_training=True
    )
    assert not dropped.any()
    assert stacked.transposes_extended
    sharding = NamedSharding(mesh, P("data"))
    stacked_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
    halo_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), halo
    )

    def device_grads(p, t, h):
        t = jax.tree.map(lambda x: x[0], t)
        h = jax.tree.map(lambda x: x[0], h)

        def exchange(x_tx, x_bd):
            return (
                _exchange_1d(x_tx, h.tx_send_left, h.tx_send_left_mask,
                             h.tx_send_right, h.tx_send_right_mask,
                             "data", N_DEV),
                _exchange_1d(x_bd, h.bd_send_left, h.bd_send_left_mask,
                             h.bd_send_right, h.bd_send_right_mask,
                             "data", N_DEV),
            )

        def loss_fn(p):
            emb = model.apply(p, t, deterministic=True,
                              exchange=exchange, pos_prenormalized=True)
            v = t.tx_valid
            s1 = jnp.where(v, (emb["tx"] ** 2).sum(-1), 0.0).sum()
            c1 = v.sum().astype(jnp.float32)
            x_tx_ext = jnp.concatenate(
                _exchange_1d(
                    emb["tx"], h.tx_send_left, h.tx_send_left_mask,
                    h.tx_send_right, h.tx_send_right_mask, "data", N_DEV,
                ),
                axis=0,
            )
            link = (x_tx_ext[t.sg_src] * emb["bd"][t.sg_dst]).sum(-1)
            s2 = jnp.where(t.sg_mask, link, 0.0).sum()
            c2 = t.sg_mask.sum().astype(jnp.float32)
            # differentiate only the LOCAL numerators over the (stopped)
            # global counts; a psum'd loss would over-count grads by the
            # shard count (psum's transpose is psum)
            counts = jax.lax.stop_gradient(
                jax.lax.psum(jnp.stack([c1, c2]), "data")
            )
            return s1 / counts[0] + s2 / counts[1]

        grads = jax.grad(loss_fn)(p)
        return jax.lax.psum(grads, "data")

    fn = jax.jit(jax.shard_map(
        device_grads, mesh=mesh,
        in_specs=(P(), P("data"), P("data")), out_specs=P(),
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


def test_make_sharded_train_step_runs_and_learns(graph):
    """Production losses end-to-end: several whole-slide optimizer
    steps over the mesh; loss stays finite and moves."""
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig

    tr = SeggerTrainer(
        graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=4, seed=0),
    )
    history = tr.fit_whole_slide(make_mesh(N_DEV), max_epochs=4)
    assert len(history) == 4
    losses = [h["train:loss"] for h in history]
    assert all(np.isfinite(losses))
    assert losses[-1] != losses[0]
    flat, _ = jax.flatten_util.ravel_pytree(tr.params)
    assert bool(jnp.isfinite(flat).all())

    # the trained params drive whole-slide prediction unchanged
    preds = tr.predict_whole_slide(make_mesh(N_DEV))
    assert len(preds["row_index"]) == graph.n_tx
