"""Block-size sweep for the production post-gather kernels.

One (fwd_budget, bwd_budget) configuration per process (the env knobs
are read at import): measures the tt edge stage forward chain and the
fwd+bwd chain at bench shapes.

    for f in 2048 4096 8192; do for b in 2048 4096; do
        SEGGER_PG_BLOCK_EDGES=$f SEGGER_PG_BLOCK_EDGES_BWD=$b \
            timeout 600 python tools/blk_sweep.py; done; done
"""
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_tile, _chained_ms, _round_trip_floor_ms
    from segger_tpu.ops.pallas import postgather as pg
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    F32 = jnp.float32
    tile = build_tile()
    csr, csr_t = tile.tt, tile.tt_t
    n = tile.tx_gene.shape[0]
    rng = np.random.default_rng(0)
    xl = jnp.asarray(rng.normal(size=(n, 128)), jnp.bfloat16)
    xr = jnp.asarray(rng.normal(size=(n, 128)), jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(2, 64)), jnp.bfloat16)
    keep = pg.no_dropout_keep(2, jnp.bfloat16)
    cfg = (2, 0.2, False)

    def stage(x):
        return pg.gatv2_edge_stage_pallas(x, xr, att, keep, csr, csr_t,
                                          cfg)

    N = 100
    floor = _round_trip_floor_ms(N)

    @jax.jit
    def fwd_chain(x):
        def body(i, carry):
            x, acc = carry
            acc2 = acc + stage(x).astype(F32).sum()
            return (x + (acc2 * 1e-30).astype(x.dtype), acc2)
        return jax.lax.fori_loop(0, N, body, (x, 0.0))[1]

    @jax.jit
    def fwdbwd_chain(x):
        def body(i, carry):
            x, acc = carry
            v, g = jax.value_and_grad(
                lambda x: stage(x).astype(F32).sum()
            )(x)
            return (x + (g * 1e-30).astype(x.dtype), acc + v)
        return jax.lax.fori_loop(0, N, body, (x, 0.0))[1]

    res = {
        "fwd_budget": int(os.environ.get("SEGGER_PG_BLOCK_EDGES",
                                         "8192")),
        "bwd_budget": int(os.environ.get("SEGGER_PG_BLOCK_EDGES_BWD",
                                         "4096")),
        "fwd_ms": round(_chained_ms(lambda: fwd_chain(xl), N) - floor,
                        4),
        "fwdbwd_ms": round(
            _chained_ms(lambda: fwdbwd_chain(xl), N) - floor, 4),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
