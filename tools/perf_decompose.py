"""Decompose the training step's device time on the real chip.

Times four chained variants of the bench workload (same tile, model,
and chained-measurement methodology as bench.py):

  fwd        forward only (deterministic)
  fwd_drop   dropout-mode forward — the kernels' PRNG+keep delta
  fwd+bwd    grad of sum(forward outputs)  — conv forward + backward,
             no losses / no optimizer
  losses     forward + the three losses (no grad)
  step       full training step (bench parity)

The deltas localize the next optimization target (fwd+bwd and losses
both run the dropout-mode forward, so deltas subtract fwd_drop):
  dropout delta = fwd_drop - fwd
  bwd cost      = (fwd+bwd) - fwd_drop
  loss fwd cost = losses - fwd_drop
  loss bwd + adam = step - (fwd+bwd) - (losses - fwd_drop)

Usage (TPU must be otherwise idle):
    timeout 900 python tools/perf_decompose.py
"""
import json
import sys

sys.path.insert(0, ".")

from bench import build_tile, _chained_ms, _round_trip_floor_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from segger_tpu.models import ISTEncoder
    from segger_tpu.models import losses as L
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # the production TRAINING tile: no xlo bucket (predict-only split;
    # trainer._batch_plans use_xlo semantics)
    tile = build_tile(xlo=False)
    model = ISTEncoder(
        n_genes=400, in_channels=16, hidden_channels=64, out_channels=64,
        n_mid_layers=2, n_heads=2, dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.PRNGKey(0), tile)

    N = 20
    floor = _round_trip_floor_ms(N)

    @jax.jit
    def fwd_chain(p):
        def body(i, carry):
            p, acc = carry
            out = model.apply(p, tile)
            acc2 = acc + out["tx"].sum() + out["bd"].sum()
            return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)
        return jax.lax.fori_loop(0, N, body, (p, 0.0))[1]

    @jax.jit
    def fwd_dropout_chain(p):
        # dropout-mode forward (deterministic=False): isolates the conv
        # kernels' in-kernel-PRNG + keep-multiply delta over fwd_chain
        def body(i, carry):
            p, acc = carry
            out = model.apply(p, tile, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            acc2 = acc + out["tx"].sum() + out["bd"].sum()
            return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)
        return jax.lax.fori_loop(0, N, body, (p, 0.0))[1]

    @jax.jit
    def fwdbwd_chain(p):
        def loss(p):
            out = model.apply(p, tile, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            return out["tx"].sum() + out["bd"].sum()

        def body(i, carry):
            p, acc = carry
            v, g = jax.value_and_grad(loss)(p)
            return (jax.tree.map(lambda x, d: x + d * 1e-25, p, g),
                    acc + v)
        return jax.lax.fori_loop(0, N, body, (p, 0.0))[1]

    tx_sim = jnp.eye(20) * 2 - 1
    bd_sim = jnp.eye(12) * 2 - 1

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
    def losses_chain(p, keys):
        def body(carry, key):
            p, acc = carry
            v = loss_fn(p, tile, key)
            return (jax.tree.map(lambda x: x + v * 1e-25, p), acc + v), v
        (_, acc), _ = jax.lax.scan(body, (p, 0.0), keys)
        return acc

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step_chain(p, o, keys):
        def body(carry, key):
            p, o = carry
            v, g = jax.value_and_grad(loss_fn)(p, tile, key)
            u, o = opt.update(g, o, p)
            return (optax.apply_updates(p, u), o), v
        (p, o), vs = jax.lax.scan(body, (p, o), keys)
        return vs.sum()

    keys = jax.random.split(jax.random.PRNGKey(1), N)
    out = {
        "fwd_ms": _chained_ms(lambda: fwd_chain(params), N) - floor,
        "fwd_dropout_ms": _chained_ms(
            lambda: fwd_dropout_chain(params), N) - floor,
        "fwd_bwd_ms": _chained_ms(lambda: fwdbwd_chain(params), N) - floor,
        "losses_ms": _chained_ms(
            lambda: losses_chain(params, keys), N) - floor,
        "step_ms": _chained_ms(
            lambda: step_chain(params, opt_state, keys), N) - floor,
    }
    out["dropout_delta_ms"] = round(
        out["fwd_dropout_ms"] - out["fwd_ms"], 3)
    out["bwd_only_ms"] = round(
        out["fwd_bwd_ms"] - out["fwd_dropout_ms"], 3)
    # losses - dropout-mode fwd: the actual loss cost (the loss chain
    # runs deterministic=False; see tools/loss_decompose.py)
    out["loss_fwd_only_ms"] = round(
        out["losses_ms"] - out["fwd_dropout_ms"], 3)
    out["loss_bwd_plus_adam_ms"] = round(
        out["step_ms"] - out["fwd_bwd_ms"]
        - (out["losses_ms"] - out["fwd_dropout_ms"]), 3,
    )
    out = {k: round(v, 3) for k, v in out.items()}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
