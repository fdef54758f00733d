"""Decompose the loss forward (the 2.2 ms loss_fwd_only slice of the
training step, docs/runs/perf_r5.json train_decompose_production) on
FIXED embeddings, chained (bench methodology), so the conv forward is
excluded:

  tx_triplet   triplet_loss on 50k tx anchors (the big one)
  bd_metric    metric_loss on the bd nodes
  sg           segmentation_loss over supervision edges
  sample_only  sample_triplets alone (tx): the cluster/member draws
  all3         the production loss sum

    timeout 590 python tools/loss_decompose.py
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_tile, _chained_ms, _round_trip_floor_ms
    from segger_tpu.models import losses as L
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tile = build_tile(xlo=False)
    n_tx = tile.tx_gene.shape[0]
    n_bd = tile.bd_x.shape[0]
    rng = np.random.default_rng(0)
    emb_tx = jnp.asarray(rng.normal(size=(n_tx, 64)), jnp.float32)
    emb_bd = jnp.asarray(rng.normal(size=(n_bd, 64)), jnp.float32)
    tx_sim = jnp.eye(20) * 2 - 1
    bd_sim = jnp.eye(12) * 2 - 1
    tx_valid = tile.tx_interior & tile.tx_valid
    bd_valid = tile.bd_interior & tile.bd_valid
    tx_ss = (tile.tx_sampler_sorted, tile.tx_sampler_counts)
    bd_ss = (tile.bd_sampler_sorted, tile.bd_sampler_counts)

    def tx_triplet(etx, ebd, key):
        s, c = L.triplet_loss(key, etx, tile.tx_cluster, tx_valid,
                              tx_sim, 0.3, sort_structure=tx_ss)
        return s / jnp.maximum(c, 1)

    def bd_metric(etx, ebd, key):
        s, c = L.metric_loss(key, ebd, tile.bd_cluster, bd_valid,
                             bd_sim, sort_structure=bd_ss)
        return s / jnp.maximum(c, 1)

    def sg(etx, ebd, key):
        s, c = L.segmentation_loss(key, etx, ebd, tile.sg_src,
                                   tile.sg_dst, tile.sg_mask,
                                   tile.bd_valid.sum())
        return s / jnp.maximum(c, 1)

    def sample_only(etx, ebd, key):
        s = L.sample_triplets(key, tile.tx_cluster, tx_valid, tx_sim,
                              sort_structure=tx_ss)
        return (s.positives.sum() + s.negatives.sum()) * 1e-9 \
            + s.dists_pos.sum() + s.dists_neg.sum() + etx.sum() * 1e-30

    def all3(etx, ebd, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return (tx_triplet(etx, ebd, k1) + bd_metric(etx, ebd, k2)
                + sg(etx, ebd, k3))

    N = 100
    floor = _round_trip_floor_ms(N)
    res = {"floor_ms": round(floor, 4)}
    keys = jax.random.split(jax.random.PRNGKey(1), N)
    for name, fn in [("sample_only", sample_only),
                     ("tx_triplet", tx_triplet),
                     ("bd_metric", bd_metric), ("sg", sg),
                     ("all3", all3)]:
        @jax.jit
        def chain(etx, ebd, keys, fn=fn):
            def body(carry, key):
                etx, ebd, acc = carry
                acc2 = acc + fn(etx, ebd, key)
                return (etx + acc2 * 1e-30, ebd + acc2 * 1e-30,
                        acc2), acc2
            return jax.lax.scan(body, (etx, ebd, 0.0), keys)[0][2]
        res[name + "_ms"] = round(
            _chained_ms(lambda: chain(emb_tx, emb_bd, keys), N) - floor,
            4,
        )
        print(name, res[name + "_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
