"""Isolate + decompose the loss forward (2.6 ms in the r3 step).

Chains the three losses over a FIXED embedding (so conv cost is
excluded), then times each loss separately and captures an xplane trace
of the combined chain.  Localizes the VERDICT r3 item-2 target
("loss fwd <= ~1.2 ms").

    timeout 900 python tools/trace_loss.py [trace_out]
"""
import json
import sys

sys.path.insert(0, ".")

from bench import build_tile, _chained_ms, _round_trip_floor_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from segger_tpu.models import losses as L
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tile = build_tile()
    n_tx = tile.tx_gene.shape[0]
    n_bd = tile.bd_x.shape[0]
    rng = np.random.default_rng(0)
    emb_tx = jnp.asarray(rng.normal(size=(n_tx, 64)), jnp.float32)
    emb_bd = jnp.asarray(rng.normal(size=(n_bd, 64)), jnp.float32)
    tx_sim = jnp.eye(20) * 2 - 1
    bd_sim = jnp.eye(12) * 2 - 1

    N = 100
    floor = _round_trip_floor_ms(N)

    def chain(fn):
        @jax.jit
        def f(etx, ebd, key):
            def body(i, carry):
                etx, ebd, acc = carry
                k = jax.random.fold_in(key, i)
                v = fn(etx, ebd, k)
                acc2 = acc + v
                return (etx + acc2 * 1e-30, ebd + acc2 * 1e-30, acc2)
            return jax.lax.fori_loop(0, N, body, (etx, ebd, 0.0))[2]
        return f

    def tx_loss(etx, ebd, k):
        s, c = L.triplet_loss(
            k, etx, tile.tx_cluster, tile.tx_interior & tile.tx_valid,
            tx_sim, 0.3,
            sort_structure=(tile.tx_sampler_sorted,
                            tile.tx_sampler_counts),
        )
        return s / jnp.maximum(c, 1)

    def bd_loss(etx, ebd, k):
        s, c = L.metric_loss(
            k, ebd, tile.bd_cluster, tile.bd_interior & tile.bd_valid,
            bd_sim,
            sort_structure=(tile.bd_sampler_sorted,
                            tile.bd_sampler_counts),
        )
        return s / jnp.maximum(c, 1)

    def sg_loss(etx, ebd, k):
        s, c = L.segmentation_loss(
            k, etx, ebd, tile.sg_src, tile.sg_dst, tile.sg_mask,
            tile.bd_valid.sum(),
        )
        return s / jnp.maximum(c, 1)

    def all_losses(etx, ebd, k):
        k1, k2, k3 = jax.random.split(k, 3)
        return (tx_loss(etx, ebd, k1) + bd_loss(etx, ebd, k2)
                + sg_loss(etx, ebd, k3))

    def tx_loss_barrier(etx, ebd, k):
        """tx triplet with optimization barriers around the row
        gathers: XLA fusing a gather into the consumer loop-fusion
        de-vectorizes it (the r4 trace's 0.6 ms f32[50k,64] fusions);
        the barrier forces a standalone (fast) gather op."""
        s = L.sample_triplets(
            k, tile.tx_cluster, tile.tx_interior & tile.tx_valid,
            tx_sim,
            sort_structure=(tile.tx_sampler_sorted,
                            tile.tx_sampler_counts),
        )
        a = etx
        p = jax.lax.optimization_barrier(etx[s.positives])
        ng = jax.lax.optimization_barrier(etx[s.negatives])
        dp = jnp.sqrt(jnp.sum((a - p) ** 2, axis=-1) + 1e-12)
        dn = jnp.sqrt(jnp.sum((a - ng) ** 2, axis=-1) + 1e-12)
        per = jnp.maximum(dp - dn + 0.3, 0.0)
        sm = jnp.where(s.ok, per, 0.0).sum()
        return sm / jnp.maximum(s.ok.sum(), 1)

    key = jax.random.PRNGKey(0)
    out = {}
    for name, fn in [("tx_triplet", tx_loss), ("bd_metric", bd_loss),
                     ("sg_link", sg_loss), ("all", all_losses),
                     ("tx_triplet_barrier", tx_loss_barrier)]:
        c = chain(fn)
        out[name + "_ms"] = round(
            _chained_ms(lambda: c(emb_tx, emb_bd, key), N) - floor, 4
        )
    out["floor_ms"] = round(floor, 4)
    print(json.dumps(out))

    if len(sys.argv) > 1:
        trace_out = sys.argv[1]
        c = chain(all_losses)
        float(np.asarray(c(emb_tx, emb_bd, key)))
        with jax.profiler.trace(trace_out):
            float(np.asarray(c(emb_tx, emb_bd, key)))
        print(f"trace written to {trace_out}")


if __name__ == "__main__":
    main()
