"""Evidence that the halo ppermute overlaps the local projection matmul.

The 1-D/2-D sharded convs project the halo-extended source in PIECES
(models/gatv2.py): the large local-rows matmul takes only local data, so
it carries no data dependency on the ppermute producing the halo rows,
and XLA's latency-hiding scheduler is free to run the collective during
the matmul.  This tool verifies the claim against the REAL TPU compiler
without multi-chip hardware:

  1. AOT-compiles the 1-D halo-sharded predict step against an 8-device
     v5e TPU *topology* (jax.experimental.topologies — compile-only, no
     chips needed),
  2. walks the scheduled HLO and reports, for every
     ``collective-permute-start`` ... ``collective-permute-done`` pair,
     how many fusion/convolution/dot ops the scheduler placed INSIDE the
     async window (overlap) and whether any of them is a wide matmul.

Usage:
    timeout 900 python tools/overlap_evidence.py

The committed finding lives in docs/design.md ("Halo exchange overlap").
"""
import re
import sys

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from segger_tpu.data.synthetic import make_synthetic
    from segger_tpu.pipeline import ISTPipeline, PipelineConfig
    from segger_tpu.models import ISTEncoder
    from segger_tpu.parallel.halo import (
        HaloSpec, build_sharded_graph, make_sharded_predict,
    )

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4"
    )
    mesh = Mesh(np.array(topo.devices), ("data",))
    print(f"AOT topology: {len(topo.devices)} x {topo.devices[0].device_kind}")

    # host build on a small slide (shapes only matter for the compile)
    s = make_synthetic(n_cells=200, n_genes=30, mean_tx_per_cell=20,
                       seed=3, extent=400.0)
    cfg = PipelineConfig(
        cells_embedding_size=16, genes_min_counts=10, cells_min_counts=5,
        prediction_graph_mode="uniform", prediction_graph_max_k=4,
    )
    p = ISTPipeline(s.transcripts, s.boundaries, s.polygons, cfg).load()
    graph = p.graph
    stacked, halo, _ = build_sharded_graph(graph, len(topo.devices))

    model = ISTEncoder(
        n_genes=graph.n_genes,
        in_channels=graph.gene_embedding.shape[1],
        hidden_channels=64, out_channels=64, n_mid_layers=2, n_heads=2,
        dtype=jnp.bfloat16,
    )
    # abstract params (no devices needed): init shapes via eval_shape
    tile0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[0]), stacked)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), tile0)
    )

    fn = make_sharded_predict(model, mesh)
    shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                       np.asarray(x).dtype),
        (stacked, HaloSpec(**{k: np.asarray(v) for k, v in
                              vars(halo).items()})),
    )
    lowered = fn.lower(params, *shapes)
    compiled = lowered.compile()
    txt = compiled.as_text()

    # walk the schedule: ops between each cp-start and its cp-done
    lines = txt.splitlines()
    windows = []
    open_starts = {}
    for i, ln in enumerate(lines):
        m = re.search(r"%(\S*collective-permute-start\S*) =", ln)
        if m:
            open_starts[m.group(1)] = (i, [])
            continue
        md = re.search(
            r"collective-permute-done\S* = \S+ collective-permute-done\("
            r"%(\S+?)[),]", ln)
        if md and md.group(1) in open_starts:
            start_i, ops = open_starts.pop(md.group(1))
            windows.append((start_i, i, ops))
            continue
        for ops_list in (v[1] for v in open_starts.values()):
            mm = re.match(r"\s+%(\S+) = (\S+) (fusion|convolution|dot)\(",
                          ln)
            if mm:
                ops_list.append((mm.group(1), mm.group(2)))

    n_overlapped = 0
    wide = 0
    for start_i, done_i, ops in windows:
        if ops:
            n_overlapped += 1
        for name, shape in ops:
            # a "wide" op touches a >=1k-row operand — the local matmul
            nums = [int(x) for x in re.findall(r"\d+", shape)[:2]]
            if nums and max(nums) >= 1024:
                wide += 1
    print(f"collective-permute windows: {len(windows)}")
    print(f"  with >=1 compute op scheduled inside: {n_overlapped}")
    print(f"  wide (>=1k-row) ops inside windows:   {wide}")
    for start_i, done_i, ops in windows[:6]:
        print(f"  window lines {start_i}..{done_i}: "
              f"{[n[:40] for n, _ in ops][:4]}")
    if windows and n_overlapped == 0:
        print("NO OVERLAP: scheduler serialized every exchange")
        sys.exit(1)
    print("OVERLAP CONFIRMED" if n_overlapped else "no windows found")


if __name__ == "__main__":
    main()
