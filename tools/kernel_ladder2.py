"""Ladder 2: is the edge-stage kernel DMA-bandwidth-bound or
grid/overhead-bound?  (Ladder 1 showed v0_dma == full kernel == 1.55 ms
at bench shapes — the softmax chain is FREE; docs/design.md §2's 'VPU
bound' conclusion was wrong.)

Variants:
  fold_only      the chain's own g3-fold cost (no kernel at all)
  xla_rowsum     out = g3.sum(1) in pure XLA (no pallas)
  dma_blk256/1024  v0_dma at 2k / 8k edge rows per block
  dma_f32        v0_dma on an f32 gathered tensor (2x bytes): time 2x
                 => bandwidth-bound; time flat => overhead-bound
  dma_noalpha    v0_dma without the alpha residual output

    timeout 1500 python tools/kernel_ladder2.py
"""
import functools
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bench import build_tile, _chained_ms, _round_trip_floor_ms
    from segger_tpu.ops.pallas import postgather as pg
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    F32 = jnp.float32

    tile = build_tile()
    csr = tile.tt
    n_tx = tile.tx_gene.shape[0]
    hc, heads = 128, 2
    rng = np.random.default_rng(0)
    xl = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    xr = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    keep = pg.no_dropout_keep(heads, jnp.bfloat16)

    blk0 = pg._block_rows(csr.idx.shape[1])
    g3, xr_p, _, mask_f, n_dst, n_pad, k, _ = pg._prep(
        xl, xr, keep, csr, blk0
    )
    g3_f32 = g3.astype(F32)

    def dma_kernel(g_ref, out_ref, alpha_ref):
        g = g_ref[:]
        out_ref[:] = g.astype(F32).sum(axis=1).astype(out_ref.dtype)
        alpha_ref[:] = jnp.zeros_like(alpha_ref)

    def dma_kernel_noalpha(g_ref, out_ref):
        g = g_ref[:]
        out_ref[:] = g.astype(F32).sum(axis=1).astype(out_ref.dtype)

    def make_dma(blk, dtype, with_alpha=True):
        out_specs = [pl.BlockSpec((blk, hc), lambda b: (b, 0),
                                  memory_space=pltpu.VMEM)]
        out_shape = [jax.ShapeDtypeStruct((n_pad, hc), dtype)]
        kern = dma_kernel_noalpha
        if with_alpha:
            out_specs.append(pl.BlockSpec((blk, k, heads),
                                          lambda b: (b, 0, 0),
                                          memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((n_pad, k, heads), F32))
            kern = dma_kernel

        def fn(g):
            return pl.pallas_call(
                kern,
                grid=(n_pad // blk,),
                in_specs=[pl.BlockSpec((blk, k, hc),
                                       lambda b: (b, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=out_specs,
                out_shape=out_shape,
            )(g)[0]
        return fn

    N = 100
    floor = _round_trip_floor_ms(N)
    res = {"floor_ms": round(floor, 4),
           "n_pad": int(n_pad), "k": int(k)}

    def chain(stage, g):
        @jax.jit
        def f(g):
            def body(i, carry):
                g, acc = carry
                acc2 = acc + stage(g)
                return (g + (acc2 * 1e-30).astype(g.dtype), acc2)
            return jax.lax.fori_loop(0, N, body, (g, 0.0))[1]
        return lambda: f(g)

    cases = {
        "fold_only": (lambda g: g[0, 0, 0].astype(F32), g3),
        "xla_rowsum": (
            lambda g: g.astype(F32).sum(axis=1).sum() * 1e-9, g3),
        "dma_blk256": (
            lambda g: make_dma(256, jnp.bfloat16)(g)
            .astype(F32).sum() * 1e-9, g3),
        "dma_blk1024": (
            lambda g: make_dma(1024, jnp.bfloat16)(g)
            .astype(F32).sum() * 1e-9, g3),
        "dma_f32_blk512": (
            lambda g: make_dma(512, F32)(g)
            .sum() * 1e-9, g3_f32),
        "dma_noalpha_blk1024": (
            lambda g: make_dma(1024, jnp.bfloat16, with_alpha=False)(g)
            .astype(F32).sum() * 1e-9, g3),
    }
    for name, (stage, g) in cases.items():
        try:
            c = chain(stage, g)
            res[name + "_ms"] = round(_chained_ms(c, N) - floor, 4)
        except Exception as ex:  # noqa: BLE001
            res[name + "_ms"] = f"FAIL {type(ex).__name__}: {str(ex)[:150]}"
        print(name, res[name + "_ms"], flush=True)
    gb = n_pad * k * hc * 2 / 1e9
    res["g3_gb"] = round(gb, 4)
    for nm in ("dma_blk256", "dma_blk1024"):
        v = res.get(nm + "_ms")
        if isinstance(v, float) and v > 0:
            res[nm + "_gbps"] = round(gb / (v / 1e3), 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
