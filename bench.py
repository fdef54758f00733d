"""Benchmark: hetero-GATv2 message-passing throughput on one TPU chip.

Measures edge-visits/second through the full SpMM+SDDMM stack (the
framework's hot loop — reference hot loop: PyG GATv2Conv + torch_scatter,
src/segger/models/ist_encoder.py:109-134) on a Xenium-tile-scale graph:
50k transcripts (the reference's default tile budget,
data_module.py:155), kNN k=5, 2.5k boundary nodes.

Timing: every metric is measured as an N-iteration data-dependent chain
inside ONE dispatch (fori_loop/scan with the output folded back into the
inputs), ending in a HOST FETCH of a scalar reduced from the result.
Per-call wall-clock through this environment's tunneled TPU backend is
untrustworthy in both directions — dispatch latency swings 0.1-30 ms
between sessions, and `block_until_ready` has been observed returning
both before execution completed AND ~30 ms late (tunnel round trip).
The host fetch forces completion; the measured per-chain round-trip
floor (a trivial chain of the same length) is subtracted so the number
is device time, not tunnel latency.

Graph realism: every edge set is spatial.  tx positions and the tt
kNN graph are a real spatial kNN (uniform point density at Xenium
scale) in the production strip-major row order (the same locality
ordering extract_tile applies); boundary nodes sit on a jittered grid
at Xenium-like cell pitch; supervision edges are nearest-cell
assignments and candidate edges the 3 nearest cells per transcript —
the same structure the host pipeline produces on a real slide.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": R}
``vs_baseline`` is the fraction of the dtype-true (bf16) single-chip
HBM-roofline speed of light (the reference publishes no numbers —
BASELINE.md); the f32 naive-gather roofline is also reported in
``detail.vs_f32_roofline`` for cross-round comparability.
"""
import json
import statistics
import time

import numpy as np


def build_tile(n_tx=50_000, n_bd=2_500, n_genes=400, f_bd=128, seed=0,
               xlo=True):
    import jax
    import jax.numpy as jnp
    from segger_tpu.ops import coo_to_padded_csr, transpose_csr
    from segger_tpu.data.graph import TileGraph
    from segger_tpu.data.neighbors_host import kdtree_neighbors

    rng = np.random.default_rng(seed)
    # extent scales with sqrt(n_tx): constant Xenium-like density
    # (~140 tx/100um^2 at the 50k default) for every tile size
    ext = 600.0 * float(np.sqrt(n_tx / 50_000))
    pos = rng.uniform(0, ext, (n_tx, 2)).astype(np.float32)

    # Mirror the production tile path (data/partition.py::extract_tile):
    # tx rows are strip-major locality ordered before graph assembly, so
    # the tt neighbor-index band matches what extract_tile produces.
    from segger_tpu.data.partition import _strip_major_order

    pos = pos[_strip_major_order(pos)]
    src, dst = kdtree_neighbors(pos, max_k=5, max_dist=5.0)

    # Spatially realistic boundary layer: cells on a jittered grid
    # (~12um pitch at these densities, Xenium-like) instead of uniform
    # random draws, so tb/cand gather locality reflects a real slide.
    g = int(np.ceil(np.sqrt(n_bd)))
    gx, gy = np.meshgrid(np.arange(g), np.arange(g))
    centers = np.stack([gx.ravel(), gy.ravel()], 1)[:n_bd]
    pitch = ext / g
    bd_pos = (
        centers * pitch + pitch / 2
        + rng.normal(0, pitch / 6, (n_bd, 2))
    ).astype(np.float32)

    # Supervision: "nuclear" transcripts assigned to their nearest cell
    # (reference semantics: vendor nucleus assignment, neighbors.py:183-197).
    from scipy.spatial import cKDTree

    bd_tree = cKDTree(bd_pos)
    nn_bd = bd_tree.query(pos, k=1, workers=-1)[1]
    sg_sel = rng.uniform(size=n_tx) < 0.3
    sg_src = np.where(sg_sel)[0]
    sg_dst = nn_bd[sg_sel]

    # Candidates: 3 spatially nearest cells per transcript (the outcome
    # of the reference's buffered-containment prediction graph,
    # neighbors.py:200-238, for well-separated cells).
    cand_dst = bd_tree.query(pos, k=3, workers=-1)[1]
    cand_src = np.repeat(np.arange(n_tx), 3)
    cand_dst = cand_dst.ravel()

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
        # K stays a multiple of 8: XLA tiles the middle dim of
        # (n, K, 128) bf16 arrays to 8 sublanes, so exact K=5 pads to 8
        # in HBM anyway and only loses alignment (measured: step
        # 25.5 -> 27.8 ms with exact widths)
        tt=(tt := coo_to_padded_csr(dst, src, n_dst=n_tx,
                                    pad_to_multiple=8)),
        tb=(tb := coo_to_padded_csr(sg_dst, sg_src, n_dst=n_bd,
                                    pad_to_multiple=8)),
        cand=coo_to_padded_csr(cand_src, cand_dst, n_dst=n_tx, k=4),
        sg_src=sg_src.astype(np.int32),
        sg_dst=sg_dst.astype(np.int32),
        sg_mask=np.ones(sg_src.size, bool),
        tt_t=transpose_csr(tt, n_src=n_tx),
        tb_t=transpose_csr(tb, n_src=n_tx),
    )
    # host-precomputed triplet-sampler block structure
    from segger_tpu.data.partition import _sampler_structure

    tx_ss, tx_sc = _sampler_structure(
        tile.tx_cluster, tile.tx_interior, n_tx, n_tx, 20
    )
    bd_ss, bd_sc = _sampler_structure(
        tile.bd_cluster, tile.bd_interior, n_bd, n_bd, 12
    )
    tile = tile.replace(
        tx_sampler_sorted=tx_ss, tx_sampler_counts=tx_sc,
        bd_sampler_sorted=bd_ss, bd_sampler_counts=bd_sc,
    )
    # degree bucketing: narrow kernel on low-in-degree rows (the
    # production extract_tile path applies the same transform)
    from segger_tpu.data.partition import (
        apply_degree_bucketing, DEGREE_BUCKET_K_LO, DEGREE_BUCKET_K_XLO,
    )

    deg = np.asarray(tile.tt.mask).sum(1)
    n_lo = int((deg <= DEGREE_BUCKET_K_LO).sum()) // 8 * 8
    # the xlo (deg<=4, K=4) bucket is predict/forward-only in
    # production (its extra transpose grows the backward's row-rate-
    # bound dxl gather; see trainer._batch_plans) — xlo=False builds
    # the training-tile variant
    n_xlo = (
        int((deg <= DEGREE_BUCKET_K_XLO).sum()) // 8 * 8 if xlo else 0
    )
    tile = apply_degree_bucketing(tile, n_lo=n_lo, n_xlo=n_xlo)
    return jax.tree.map(jnp.asarray, tile)


def _chained_ms(chained_fn, n_iters, reps=5):
    """Median per-iteration time of a pre-jitted n-iteration chain.

    ``chained_fn`` must return something reducible to a scalar; the
    float() host fetch forces real completion (block_until_ready is
    unreliable through the tunneled backend)."""
    ts = []
    float(np.asarray(chained_fn()).ravel()[0])  # warm / compile
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(chained_fn()).ravel()[0])
        ts.append((time.perf_counter() - t0) / n_iters)
    return statistics.median(ts) * 1e3


def _round_trip_floor_ms(n_iters):
    """Per-iteration cost of a trivial same-length chain: dispatch +
    tunnel round trip + fetch, amortized.  Subtracted from every
    measurement so results are device time."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def floor_chain(x):
        def body(i, x):
            return x * 1.0000001
        return jax.lax.fori_loop(0, n_iters, body, x).sum()

    z = jnp.zeros((8,), jnp.float32)
    return _chained_ms(lambda: floor_chain(z), n_iters)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from segger_tpu.models import ISTEncoder
    from segger_tpu.models import losses as L
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    tile = build_tile()
    n_layers = 4  # 2 + n_mid_layers
    # bfloat16 compute is the production default (TrainConfig
    # .compute_dtype; accuracy soak in examples/xenium_scale.py) —
    # bench measures the default configuration.
    model = ISTEncoder(
        n_genes=400, in_channels=16, hidden_channels=64, out_channels=64,
        n_mid_layers=2, n_heads=2, dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), tile)

    # forward: 50 chained iterations, outputs folded into params
    N_FWD = 50
    floor_fwd = _round_trip_floor_ms(N_FWD)

    @jax.jit
    def fwd_chain(params):
        def body(i, carry):
            p, acc = carry
            out = model.apply(p, tile)
            acc2 = acc + out["tx"].sum() + out["bd"].sum()
            return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)

        return jax.lax.fori_loop(0, N_FWD, body, (params, 0.0))[1]

    fwd_ms = _chained_ms(lambda: fwd_chain(params), N_FWD) - floor_fwd

    # ------------------------------------------------------------------
    # Achievable-floor measurement (VERDICT r4 item 4).  The bf16
    # naive-gather HBM roofline (sol_fwd_ms_bf16) is UNREACHABLE by
    # construction while the neighbor gather runs in XLA: XLA's random-
    # row gather is row-rate bound (~580M rows/s measured, design.md
    # §2), and the gathered (N, K, HC) tensor must then be materialized
    # for the Pallas edge kernel (kernel_ladder: a pure-DMA kernel
    # costs the same as the full fused kernel).  The honest floor is
    # therefore measured, not modeled: per layer, perform EXACTLY the
    # forward's gathers on this tile's real index tables (degree-
    # bucketed lo/hi tt split + tb), materialize them
    # (optimization_barrier — the kernel cannot fuse into the gather),
    # and stream one read + the (N, HC) output write (the kernel's DMA
    # floor).  Only the banded in-VMEM gather (ops/pallas/banded.py,
    # Mosaic-blocked) can go below this floor.
    n_tx_ = tile.tx_gene.shape[0]
    n_lo = int(tile.tt_n_lo)
    n_xlo = int(tile.tt_n_xlo)
    # the forward's per-layer tt gather tables (degree-bucketed
    # segments + full-width tail), exactly as the edge stage issues them
    if n_xlo > 0:
        tt_tables = [
            tile.tt.idx[:n_xlo, : int(tile.tt_k_xlo)],
            tile.tt.idx[n_xlo:n_lo, : int(tile.tt_k_lo)],
            tile.tt.idx[n_lo:, :],
        ]
    elif n_lo > 0:
        tt_tables = [
            tile.tt.idx[:n_lo, : int(tile.tt_k_lo)],
            tile.tt.idx[n_lo:, :],
        ]
    else:
        tt_tables = [tile.tt.idx]
    idx_tb = tile.tb.idx
    rows_per_layer = int(
        sum(t.size for t in tt_tables) + idx_tb.size
    )

    def _layer_floor(h, acc):
        outs = []
        for t in tt_tables:
            g = jax.lax.optimization_barrier(h[t])
            outs.append(g.sum(axis=1))
        g_tb = jax.lax.optimization_barrier(h[idx_tb])
        out = jnp.concatenate(outs, axis=0)
        acc = acc + g_tb.sum(axis=1).astype(jnp.float32).sum() * 1e-30
        return out, acc

    @jax.jit
    def achievable_chain(x0):
        def body(i, carry):
            h, acc = carry
            for _ in range(n_layers):
                h, acc = _layer_floor(h, acc)
            acc2 = acc + h.astype(jnp.float32).sum() * 1e-30
            return (x0 + (acc2 * 1e-25).astype(x0.dtype), acc2)

        return jax.lax.fori_loop(
            0, N_FWD, body, (x0, jnp.float32(0.0))
        )[1]

    x0 = jnp.zeros((n_tx_, 128), jnp.bfloat16)
    achievable_ms = (
        _chained_ms(lambda: achievable_chain(x0), N_FWD) - floor_fwd
    )

    # gather-only rung: the same gathers, no read-back — the measured
    # device random-row gather rate (design.md §2's ~580M rows/s)
    @jax.jit
    def gather_only_chain(x0):
        def body(i, carry):
            h, acc = carry
            for _ in range(n_layers):
                for t in tt_tables + [idx_tb]:
                    g = jax.lax.optimization_barrier(h[t])
                    acc = acc + g[0, 0, 0].astype(jnp.float32)
            return (x0 + (acc * 1e-25).astype(x0.dtype), acc)

        return jax.lax.fori_loop(
            0, N_FWD, body, (x0, jnp.float32(0.0))
        )[1]

    gather_only_ms = (
        _chained_ms(lambda: gather_only_chain(x0), N_FWD) - floor_fwd
    )
    gather_rows_per_sec = (
        rows_per_layer * n_layers / (gather_only_ms / 1e3)
        if gather_only_ms > 0 else 0.0
    )

    # prediction step: forward + candidate cosine scoring + per-tx
    # segment-max assignment (the reference's scatter_max hot op,
    # lightning_model.py:275-284)
    from segger_tpu.ops import score_candidates

    @jax.jit
    def predict_chain(params):
        def body(i, carry):
            p, acc = carry
            emb = model.apply(p, tile)
            max_sim, seg = score_candidates(
                emb["tx"], emb["bd"], tile.cand, tile.bd_index,
                dtype=jnp.bfloat16,  # production bf16 scoring path
                normalized=True,     # encoder emits unit vectors
            )
            acc2 = acc + max_sim.sum() + seg.sum() * 1e-9
            return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)

        return jax.lax.fori_loop(0, N_FWD, body, (params, 0.0))[1]

    predict_ms = _chained_ms(lambda: predict_chain(params), N_FWD) - floor_fwd

    # full training step (fwd + 3 losses + grads + adam)
    tx_sim = jnp.eye(20) * 2 - 1
    bd_sim = jnp.eye(12) * 2 - 1
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p, t, key):
        k_drop, k_tx, k_bd, k_sg = jax.random.split(key, 4)
        emb = model.apply(p, t, deterministic=False,
                          rngs={"dropout": k_drop})
        s1, c1 = L.triplet_loss(
            k_tx, emb["tx"], t.tx_cluster,
            t.tx_interior & t.tx_valid, tx_sim, 0.3,
            sort_structure=(t.tx_sampler_sorted, t.tx_sampler_counts),
        )
        s2, c2 = L.metric_loss(
            k_bd, emb["bd"], t.bd_cluster,
            t.bd_interior & t.bd_valid, bd_sim,
            sort_structure=(t.bd_sampler_sorted, t.bd_sampler_counts),
        )
        s3, c3 = L.segmentation_loss(
            k_sg, emb["tx"], emb["bd"], t.sg_src, t.sg_dst, t.sg_mask,
            t.bd_valid.sum(),
        )
        return (
            s1 / jnp.maximum(c1, 1)
            + s2 / jnp.maximum(c2, 1)
            + s3 / jnp.maximum(c3, 1)
        )

    # train step timed as a 10-step lax.scan chain inside one dispatch
    # (per-call dispatch latency through the tunneled backend is large
    # and unstable; chaining isolates device time)
    n_chain = 10
    floor_train = _round_trip_floor_ms(n_chain)

    @jax.jit
    def train_chain(p, o, t, keys):
        def body(carry, key):
            p, o = carry
            loss, grads = jax.value_and_grad(loss_fn)(p, t, key)
            updates, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (p, o), losses = jax.lax.scan(body, (p, o), keys)
        return losses.sum()

    # training tiles ship without the xlo bucket (trainer._batch_plans
    # use_xlo=False): its third transpose table costs the backward more
    # than its narrower gather saves the forward (measured +4 ms/step)
    tile_train = build_tile(xlo=False)

    key = jax.random.PRNGKey(1)
    keys = jax.random.split(key, n_chain)
    train_ms = _chained_ms(
        lambda: train_chain(params, opt_state, tile_train, keys), n_chain
    ) - floor_train

    # second tile shape (2x transcripts at the same spatial density —
    # a denser quadtree leaf) so kernel tuning is never validated
    # against a single bucket shape
    tile2 = build_tile(n_tx=100_000, n_bd=5_000, seed=1)

    @jax.jit
    def fwd2_chain(params):
        def body(i, carry):
            p, acc = carry
            out = model.apply(p, tile2)
            acc2 = acc + out["tx"].sum() + out["bd"].sum()
            return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)

        return jax.lax.fori_loop(0, N_FWD, body, (params, 0.0))[1]

    fwd2_ms = _chained_ms(lambda: fwd2_chain(params), N_FWD) - floor_fwd

    e_tt = int(np.asarray(tile.tt.mask).sum())
    e_tb = int(np.asarray(tile.tb.mask).sum())
    edges_per_layer = e_tt + e_tb
    edges_per_sec = edges_per_layer * n_layers / (fwd_ms / 1e3)

    # HBM-bandwidth speed-of-light model (the edge stage is
    # traffic-bound): per layer the (N*K, H*C) gathered tensor must be
    # written+read once; plus xl/xr/out streams.  v5e HBM ~819 GB/s.
    # TWO rooflines are reported:
    #   - f32 naive-gather: the roofline of the straightforward f32
    #     implementation (fixed historical reference point; dtype and
    #     fusion wins can push past 1.0 of it)
    #   - bf16 (dtype-true): the same traffic at the bytes the compute
    #     dtype actually moves — the honest per-chip speed-of-light for
    #     the production bf16 configuration.
    # ``vs_baseline`` uses the COMPUTE DTYPE's roofline (bf16).
    n_tx = tile.tx_gene.shape[0]
    k_tt = tile.tt.idx.shape[1]
    hc = 128
    elems_per_layer = 2 * n_tx * k_tt * hc + 3 * n_tx * hc
    sol_s_f32 = n_layers * elems_per_layer * 4 / 819e9
    sol_s_bf16 = n_layers * elems_per_layer * 2 / 819e9
    sol_edges_per_sec = edges_per_layer * n_layers / sol_s_bf16

    result = {
        "metric": "edges/sec/chip (SpMM+SDDMM, hetero-GATv2 fwd, "
                  "Xenium-scale tile, chained device timing)",
        "value": round(edges_per_sec, 0),
        "unit": "edges/s",
        # fraction of the dtype-true (bf16) single-chip HBM-roofline
        # speed of light
        "vs_baseline": round(edges_per_sec / sol_edges_per_sec, 4),
        "detail": {
            "fwd_ms": round(fwd_ms, 3),
            # second bucket shape: 100k tx / 5k bd at the same density
            "fwd_100k_ms": round(fwd2_ms, 3),
            "predict_step_ms": round(predict_ms, 3),
            "train_step_ms": round(train_ms, 3),
            "round_trip_floor_ms": round(floor_fwd, 3),
            "train_edges_per_sec": round(
                edges_per_layer * n_layers / (train_ms / 1e3), 0
            ),
            "edges_per_layer": edges_per_layer,
            "n_layers": n_layers,
            "compute_dtype": "bfloat16",
            "sol_reference": "bf16 (dtype-true) naive-gather HBM roofline",
            "sol_fwd_ms_bf16": round(sol_s_bf16 * 1e3, 2),
            "sol_fwd_ms_f32": round(sol_s_f32 * 1e3, 2),
            # measured achievable floor: the forward's real gathers
            # (XLA row-rate bound) + materialization + one kernel-side
            # read + output write, on this tile's actual index tables.
            # The naive-gather roofline above is unreachable while the
            # gather runs in XLA; only the banded in-VMEM gather
            # (ops/pallas/banded.py, Mosaic-blocked) can beat this.
            "sol_fwd_ms_achievable": round(achievable_ms, 3),
            "vs_achievable": round(achievable_ms / fwd_ms, 4)
            if fwd_ms > 0 else 0.0,
            "gather_rows_per_layer": rows_per_layer,
            "gather_only_ms": round(gather_only_ms, 3),
            "gather_rows_per_sec_measured": round(gather_rows_per_sec, 0),
            "vs_f32_roofline": round(
                edges_per_sec
                / (edges_per_layer * n_layers / sol_s_f32), 4
            ),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
