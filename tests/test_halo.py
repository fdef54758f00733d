"""Distributed halo-exchange tests: the 8-device sharded whole-slide
forward must reproduce the single-device full-graph computation exactly
(SURVEY §4.3)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.pipeline import ISTPipeline, PipelineConfig
from segger_tpu.models import ISTEncoder
from segger_tpu.parallel.mesh import make_mesh
from segger_tpu.parallel.halo import (
    build_sharded_graph,
    sharded_predict,
)
from segger_tpu.ops import coo_to_padded_csr, csr_gather, csr_max
from segger_tpu.data.graph import TileGraph


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
    # single full-graph tile for parameter init + reference forward
    tile = full_graph_tile(graph)
    params = model.init(jax.random.PRNGKey(0), tile)
    return model, params, tile


def full_graph_tile(graph):
    """The whole slide as one TileGraph with globally normalized
    positions (matching the sharded path's prenormalized convention)."""
    lo = np.vstack([graph.tx_pos, graph.bd_pos]).min(axis=0)
    hi = np.vstack([graph.tx_pos, graph.bd_pos]).max(axis=0)
    scale = (hi - lo) + 1e-8
    n_tx, n_bd = graph.n_tx, graph.n_bd
    e_sg = max(graph.sg_src.size, 1)
    tile = TileGraph(
        tx_gene=graph.tx_gene,
        tx_pos=((graph.tx_pos - lo) / scale).astype(np.float32),
        tx_cluster=graph.tx_cluster,
        tx_index=graph.tx_index.astype(np.int32),
        tx_valid=np.ones(n_tx, bool),
        tx_interior=np.ones(n_tx, bool),
        bd_x=graph.bd_x,
        bd_pos=((graph.bd_pos - lo) / scale).astype(np.float32),
        bd_cluster=graph.bd_cluster,
        bd_index=graph.bd_index.astype(np.int32),
        bd_valid=np.ones(n_bd, bool),
        bd_interior=np.ones(n_bd, bool),
        tt=coo_to_padded_csr(graph.tt_dst, graph.tt_src, n_dst=n_tx),
        tb=coo_to_padded_csr(graph.sg_dst, graph.sg_src, n_dst=n_bd),
        cand=coo_to_padded_csr(graph.cand_src, graph.cand_dst,
                               n_dst=n_tx),
        sg_src=np.zeros(e_sg, np.int32),
        sg_dst=np.zeros(e_sg, np.int32),
        sg_mask=np.zeros(e_sg, bool),
    )
    return jax.tree.map(jnp.asarray, tile)


def test_build_sharded_graph_partition(graph):
    stacked, halo, dropped = build_sharded_graph(graph, N_DEV)
    # every transcript owned exactly once
    idx = np.asarray(stacked.tx_index)
    valid = np.asarray(stacked.tx_valid)
    owned = idx[valid]
    assert owned.size == graph.n_tx
    assert len(np.unique(owned)) == graph.n_tx
    # no dropped tt/sg edges (strips are wide vs 5um kNN radius)
    assert dropped[0] == 0 and dropped[1] == 0
    # all edges preserved across shards
    total_tt = int(np.asarray(stacked.tt.mask).sum())
    assert total_tt == graph.tt_src.size


def test_sharded_predict_matches_single_device(graph, model_and_params):
    model, params, tile = model_and_params

    # reference: single-device full-graph prediction
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

    # sharded: 8-device mesh with per-layer halo exchange
    mesh = make_mesh(N_DEV)
    preds = sharded_predict(model, params, graph, mesh)

    order = np.argsort(preds["row_index"])
    got_seg = preds["cell_encoding"][order]
    got_sim = preds["similarity"][order]
    # row_index == position for the synthetic graph (identity mapping)
    rows = preds["row_index"][order]
    np.testing.assert_array_equal(rows, np.asarray(tile.tx_index))

    np.testing.assert_array_equal(got_seg, seg_ref)
    np.testing.assert_allclose(got_sim, sim_ref, rtol=1e-4, atol=1e-5)


def test_trainer_predict_whole_slide(graph):
    """SeggerTrainer.predict_whole_slide end-to-end over the mesh."""
    from segger_tpu.train.trainer import SeggerTrainer, TrainConfig

    tr = SeggerTrainer(
        graph,
        TrainConfig(hidden_channels=8, out_channels=8, n_mid_layers=0,
                    n_heads=1, max_epochs=1, seed=0),
    )
    from segger_tpu.data.partition import make_fit_tiles, build_tiling

    tree = build_tiling(graph, nodes_per_tile=800)
    tr.fit(make_fit_tiles(graph, tree, margin=5.0), max_epochs=1)
    preds = tr.predict_whole_slide(make_mesh(N_DEV))
    assert len(preds["row_index"]) == graph.n_tx
    assert len(np.unique(preds["row_index"])) == graph.n_tx


def test_sharded_embeddings_match_exactly(graph, model_and_params):
    """Layer outputs themselves agree (not just argmaxes)."""
    model, params, tile = model_and_params
    emb_ref = model.apply(params, tile, pos_prenormalized=True)

    from segger_tpu.parallel.halo import (
        make_sharded_predict, _exchange_1d,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(N_DEV)
    stacked, halo, _ = build_sharded_graph(graph, N_DEV)
    sharding = NamedSharding(mesh, P("data"))
    stacked_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), stacked
    )
    halo_d = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), halo
    )

    def device_fn(t, h):
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

        e = model.apply(params, t, deterministic=True,
                        exchange=exchange, pos_prenormalized=True)
        return e["tx"][None], t.tx_index[None], t.tx_valid[None]

    fn = jax.jit(jax.shard_map(
        device_fn, mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data"),
    ))
    e_tx, idx, valid = jax.tree.map(np.asarray, fn(stacked_d, halo_d))
    e_tx = e_tx.reshape(-1, e_tx.shape[-1])
    idx = idx.ravel()
    valid = valid.ravel()
    got = e_tx[valid][np.argsort(idx[valid])]
    want = np.asarray(emb_ref["tx"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_predict_fn_cached_across_calls(model_and_params):
    """make_sharded_predict must return the same jitted callable for
    the same (model, mesh) so repeated whole-slide predictions don't
    recompile (review r2: fresh closure + params baked as constants)."""
    from segger_tpu.parallel.halo import make_sharded_predict

    model, _, _ = model_and_params
    mesh = make_mesh(N_DEV)
    assert make_sharded_predict(model, mesh) is \
        make_sharded_predict(model, mesh)
