"""Dump the optimized HLO of the bench training step (single step, no
chain) with metadata, to map trace op names to source lines.

Usage:
    timeout 900 python tools/dump_train_hlo.py [out.txt]
"""
import sys

sys.path.insert(0, ".")

from bench import build_tile  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_step_hlo.txt"
    import jax
    import jax.numpy as jnp
    import optax
    from segger_tpu.models import ISTEncoder
    from segger_tpu.models import losses as L
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    tile = build_tile()
    model = ISTEncoder(
        n_genes=400, in_channels=16, hidden_channels=64, out_channels=64,
        n_mid_layers=2, n_heads=2, dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
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
        return (s1 / jnp.maximum(c1, 1) + s2 / jnp.maximum(c2, 1)
                + s3 / jnp.maximum(c3, 1))

    def step(p, o, t, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, t, key)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    lowered = jax.jit(step).lower(params, opt_state, tile,
                                  jax.random.PRNGKey(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
