"""Weak-scaling harness for halo-exchange whole-slide prediction.

BASELINE config #5: the whole-slide graph edge-partitioned across N
devices with boundary-feature exchange overlapped with aggregation.
Runs the sharded forward at several mesh sizes and reports edges/s and
scaling efficiency.  On this machine real multi-chip hardware is absent;
run with ``JAX_PLATFORMS=cpu`` and a forced host-device count for
correctness-scale numbers, or on a real pod slice for production ones.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/weak_scaling.py --cpu
"""
import sys

import os

# runnable from anywhere: the repo root is the package root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="pin to the virtual CPU mesh")
    ap.add_argument("--tx-per-shard", type=int, default=20_000)
    ap.add_argument("--mesh-sizes", type=int, nargs="+",
                    default=[1, 2, 4, 8])
    ap.add_argument("--grid", action="store_true",
                    help="use the 2-D (D/2 x 2) grid decomposition "
                         "instead of 1-D strips for D >= 4")
    args = ap.parse_args()

    import os

    if args.cpu and "xla_force_host_platform_device_count" not in \
            os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count="
              f"{max(args.mesh_sizes)}"
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.models import ISTEncoder
    from segger_tpu.parallel.mesh import make_mesh
    from segger_tpu.parallel.halo import (
        build_sharded_graph, make_sharded_predict, HaloSpec,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    results = []
    for n_dev in args.mesh_sizes:
        if n_dev > len(jax.devices()):
            print(f"skipping D={n_dev}: only {len(jax.devices())} devices")
            continue
        # weak scaling: problem size grows with the mesh
        n_cells = max(40, args.tx_per_shard * n_dev // 25)
        s = make_synthetic(
            n_cells=n_cells, n_genes=40,
            mean_tx_per_cell=25, seed=0,
            extent=400.0 * np.sqrt(n_dev),
        )
        cfg = PipelineConfig(
            cells_embedding_size=16, genes_min_counts=5,
            cells_min_counts=3, prediction_graph_mode="uniform",
        )
        pipe = ISTPipeline(
            s.transcripts, s.boundaries, s.polygons, cfg
        ).load()
        g = pipe.graph

        use_grid = args.grid and n_dev >= 4 and n_dev % 2 == 0
        if use_grid:
            from segger_tpu.parallel.grid import (
                build_grid_sharded_graph, make_grid_mesh,
                make_grid_predict,
            )

            dx, dy = n_dev // 2, 2
            mesh = make_grid_mesh(dx, dy)
            stacked, halo, dropped = build_grid_sharded_graph(g, dx, dy)
            sharding = NamedSharding(mesh, P(("x", "y")))
        else:
            mesh = make_mesh(n_dev)
            stacked, halo, dropped = build_sharded_graph(g, n_dev)
            sharding = NamedSharding(mesh, P("data"))
        put = lambda t: jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), t
        )
        stacked_d, halo_d = put(stacked), put(halo)

        model = ISTEncoder(
            n_genes=g.n_genes, in_channels=g.gene_embedding.shape[1],
            hidden_channels=64, out_channels=64, n_mid_layers=2,
            n_heads=2,
        )
        params = model.init(
            jax.random.PRNGKey(0),
            jax.tree.map(lambda x: jnp.asarray(x[0]), stacked),
        )
        fn = (
            make_grid_predict(model, mesh)
            if use_grid else make_sharded_predict(model, mesh)
        )
        out = fn(params, stacked_d, halo_d)
        jax.block_until_ready(out)

        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(params, stacked_d, halo_d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters

        n_layers = 4
        edges = int(
            np.asarray(stacked.tt.mask).sum()
            + np.asarray(stacked.tb.mask).sum()
        )
        eps = edges * n_layers / dt
        results.append(
            {
                "devices": n_dev,
                "n_tx": g.n_tx,
                "edges": edges,
                "step_ms": round(dt * 1e3, 2),
                "edges_per_sec": round(eps, 0),
            }
        )
        print(json.dumps(results[-1]))

    if len(results) > 1:
        base = results[0]["edges_per_sec"] / results[0]["devices"]
        for r in results:
            r["scaling_efficiency"] = round(
                (r["edges_per_sec"] / r["devices"]) / base, 3
            )
        print("\nweak scaling summary:")
        for r in results:
            print(
                f"  D={r['devices']}: {r['edges_per_sec']:.2e} edges/s, "
                f"efficiency {r['scaling_efficiency']:.2f}"
            )


if __name__ == "__main__":
    main()
