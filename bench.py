"""Benchmark: hetero-GATv2 message-passing throughput on one TPU chip.

Measures edge-visits/second through the full SpMM+SDDMM stack (the
framework's hot loop — reference hot loop: PyG GATv2Conv + torch_scatter,
src/segger/models/ist_encoder.py:109-134) on a Xenium-tile-scale graph:
50k transcripts (the reference's default tile budget,
data_module.py:155), kNN k=5, 2.5k boundary nodes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
``vs_baseline`` is the ratio to a 1e9 edges/s nominal target (the
reference publishes no numbers — BASELINE.md).
"""
import json
import time

import numpy as np


def build_tile(n_tx=50_000, n_bd=2_500, n_genes=400, f_bd=128, seed=0):
    import jax
    import jax.numpy as jnp
    from segger_tpu.ops import coo_to_padded_csr
    from segger_tpu.data.graph import TileGraph
    from segger_tpu.data.neighbors_host import kdtree_neighbors

    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 600, (n_tx, 2)).astype(np.float32)  # ~140 tx/100um^2
    src, dst = kdtree_neighbors(pos, max_k=5, max_dist=5.0)

    bd_pos = rng.uniform(0, 600, (n_bd, 2)).astype(np.float32)
    bd_of = rng.integers(0, n_bd, n_tx)
    sg_sel = rng.uniform(size=n_tx) < 0.3
    sg_src = np.where(sg_sel)[0]
    sg_dst = bd_of[sg_sel]
    cand_src = np.repeat(np.arange(n_tx), 3)
    cand_dst = rng.integers(0, n_bd, cand_src.size)

    tile = TileGraph(
        tx_gene=rng.integers(0, n_genes, n_tx).astype(np.int32),
        tx_pos=pos,
        tx_cluster=rng.integers(0, 20, n_tx).astype(np.int32),
        tx_index=np.arange(n_tx, dtype=np.int32),
        tx_valid=np.ones(n_tx, bool),
        tx_interior=np.ones(n_tx, bool),
        bd_x=rng.normal(size=(n_bd, f_bd)).astype(np.float32),
        bd_pos=bd_pos,
        bd_cluster=rng.integers(0, 12, n_bd).astype(np.int32),
        bd_index=np.arange(n_bd, dtype=np.int32),
        bd_valid=np.ones(n_bd, bool),
        bd_interior=np.ones(n_bd, bool),
        tt=coo_to_padded_csr(dst, src, n_dst=n_tx, pad_to_multiple=8),
        tb=coo_to_padded_csr(sg_dst, sg_src, n_dst=n_bd,
                             pad_to_multiple=8),
        cand=coo_to_padded_csr(cand_src, cand_dst, n_dst=n_tx, k=4),
        sg_src=sg_src.astype(np.int32),
        sg_dst=sg_dst.astype(np.int32),
        sg_mask=np.ones(sg_src.size, bool),
    )
    return jax.tree.map(jnp.asarray, tile)


def main():
    import jax
    import jax.numpy as jnp
    from segger_tpu.models import ISTEncoder

    tile = build_tile()
    n_layers = 4  # 2 + n_mid_layers
    model = ISTEncoder(
        n_genes=400, in_channels=16, hidden_channels=64, out_channels=64,
        n_mid_layers=2, n_heads=2,
    )
    params = model.init(jax.random.PRNGKey(0), tile)

    fwd = jax.jit(lambda p, t: model.apply(p, t))
    out = fwd(params, tile)
    jax.block_until_ready(out)

    # steady-state timing
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, tile)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    e_tt = int(np.asarray(tile.tt.mask).sum())
    e_tb = int(np.asarray(tile.tb.mask).sum())
    edges_per_layer = e_tt + e_tb
    edges_per_sec = edges_per_layer * n_layers / dt

    result = {
        "metric": "edges/sec/chip (SpMM+SDDMM, hetero-GATv2 fwd, "
                  "Xenium-scale tile)",
        "value": round(edges_per_sec, 0),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_sec / 1e9, 4),
        "detail": {
            "step_ms": round(dt * 1e3, 3),
            "edges_per_layer": edges_per_layer,
            "n_layers": n_layers,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
