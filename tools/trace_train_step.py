"""Capture an xplane trace of the bench training step (and forward).

Runs the exact bench.py workload (same tile/model/losses/optimizer) and
captures a jax.profiler trace around a few chained executions, then
prints the per-op rollup via tools/xplane_ops.py machinery.

Usage (TPU must be otherwise idle):
    timeout 900 python tools/trace_train_step.py [out_dir]

The committed op-level decomposition lives in docs/design.md
("Train-step decomposition").
"""
import subprocess
import sys

sys.path.insert(0, ".")

from bench import build_tile  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/segger-trace-train"
    import jax
    import jax.numpy as jnp
    import numpy as np
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

    @jax.jit
    def step(p, o, t, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, t, key)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    key = jax.random.PRNGKey(1)
    # warm: compile outside the trace
    p2, o2, l0 = step(params, opt_state, tile, key)
    float(l0)

    from segger_tpu.utils_profiling import trace

    with trace(out):
        for i in range(5):
            p2, o2, l0 = step(p2, o2, tile, jax.random.fold_in(key, i))
        float(np.asarray(l0))

    print(f"trace written to {out}")
    subprocess.run(
        [sys.executable, "tools/xplane_ops.py", out, "60"],
        env={"PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION": "python",
             "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )


if __name__ == "__main__":
    main()
