"""Worker process for the two-process distribution test.

Each of the two processes owns 4 virtual CPU devices (8 global).  The
worker exercises the multi-PROCESS branches of the distribution layer
that single-process tests cannot reach:

  - ``parallel.mesh.initialize_multihost`` (jax.distributed over gloo)
  - ``parallel.halo.put_sharded``'s ``make_array_from_callback`` path
    where most shards are NON-addressable (cross-host placement)
  - ``parallel.halo.fetch_global``'s ``process_allgather`` branch
    (``jax.process_count() > 1``)

It then checks the 8-way sharded whole-slide prediction against the
single-device full-graph computation (same exactness contract as
tests/test_halo.py) and prints MULTIHOST_OK.

Usage: python tests/_multihost_worker.py <pid> <nproc> <coord_addr>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from segger_tpu.parallel.mesh import initialize_multihost, make_mesh

    initialize_multihost(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.models import ISTEncoder
    from segger_tpu.parallel.halo import sharded_predict
    from segger_tpu.ops import coo_to_padded_csr, csr_gather, csr_max
    from segger_tpu.data.graph import TileGraph

    # identical deterministic build on every process (the documented
    # multi-host contract: the host pipeline is replicated per process)
    s = make_synthetic(n_cells=80, n_genes=24, mean_tx_per_cell=15, seed=5)
    cfg = PipelineConfig(
        cells_embedding_size=8,
        genes_min_counts=5,
        cells_min_counts=3,
        prediction_graph_mode="uniform",
        prediction_graph_max_k=4,
    )
    p = ISTPipeline(s.transcripts, s.boundaries, s.polygons, cfg).load()
    graph = p.graph

    model = ISTEncoder(
        n_genes=graph.n_genes,
        in_channels=graph.gene_embedding.shape[1],
        hidden_channels=8, out_channels=8, n_mid_layers=1, n_heads=2,
    )

    # whole slide as one tile (globally normalized positions) for init
    # + the single-device reference forward
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
    tile = jax.tree.map(jnp.asarray, tile)
    params = model.init(jax.random.PRNGKey(0), tile)
    # params must be process-local host arrays: a committed local-device
    # jax.Array cannot enter a jit over the global mesh
    params_host = jax.tree.map(np.asarray, params)

    # single-device reference (local computation, identical everywhere)
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

    # 8-way sharded prediction over the 2-process global mesh:
    # put_sharded places 4 addressable + 4 non-addressable shards per
    # process; fetch_global process_allgathers the outputs
    mesh = make_mesh(4 * nproc)
    preds = sharded_predict(model, params_host, graph, mesh)

    order = np.argsort(preds["row_index"])
    assert preds["row_index"].size == graph.n_tx
    np.testing.assert_array_equal(
        preds["row_index"][order], np.sort(np.asarray(tile.tx_index))
    )
    np.testing.assert_array_equal(preds["cell_encoding"][order], seg_ref)
    np.testing.assert_allclose(
        preds["similarity"][order], sim_ref, rtol=1e-4, atol=1e-5
    )
    print(f"MULTIHOST_OK pid={pid} n_tx={graph.n_tx}", flush=True)


if __name__ == "__main__":
    main()
