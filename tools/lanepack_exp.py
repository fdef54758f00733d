"""Experiment: lane-packed (compact) softmax for the post-gather kernel.

The production forward kernel (ops/pallas/postgather.py) runs the
masked-softmax chain lane-REPLICATED over (B, K, HC) f32 — only
(B, K, H) values are distinct (H=2 of 128 lanes), so the exp/max/div
chain does ~64x redundant VPU work.  docs/design.md §2 names the
lane-packed softmax as the designed-but-unbuilt lever on the stated VPU
bound (forward kernels 4x0.78 ms).

Variants timed here (forward edge stage only, bench shapes):

  base   production gatv2_edge_stage_pallas (nokeep mode)
  cmpct  compact softmax: per-head logits via (B*K, HC) @ (HC, H)
         matmul, masked softmax at (B, K, H) — K on SUBLANES, reduce
         over axis=1 is a native sublane reduction — then ONE
         (B*K, H) @ (H, HC) lane-expansion matmul for the weighted sum.
  xla    the flat XLA edge stage (context)

Timing is chained (bench.py methodology).  Run on the real chip:

    timeout 900 python tools/lanepack_exp.py
"""
import functools
import json
import sys
import time
import statistics

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
    NEG = -1e30

    print("building tile...", flush=True)
    tile = build_tile()
    print("tile built", flush=True)
    csr = tile.tt
    csr_t = tile.tt_t
    n_tx = tile.tx_gene.shape[0]
    hc, heads = 128, 2
    ch = hc // heads
    rng = np.random.default_rng(0)
    xl = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    xr = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(heads, ch)), jnp.bfloat16)
    slope = 0.2

    keep = pg.no_dropout_keep(heads, jnp.bfloat16)
    config = (heads, slope, False)

    # ---------------- compact-softmax forward kernel ----------------
    def fwd_compact(g_ref, xr_ref, mask_ref, attc_ref, e_ref,
                    out_ref, alpha_ref, *, slope):
        g = g_ref[:]
        b, k, hcd = g.shape
        h = e_ref.shape[0]
        p = g + xr_ref[:][:, None, :]
        pf = p.astype(F32)
        s = (slope * pf + (1.0 - slope) * jnp.maximum(pf, 0.0)).astype(
            g.dtype
        )
        lc = jnp.dot(
            s.reshape(b * k, hcd), attc_ref[:], preferred_element_type=F32
        ).reshape(b, k, h)
        mask3 = mask_ref[:][..., None] > 0
        z = jnp.where(mask3, lc, NEG)
        z = z - z.max(axis=1, keepdims=True)
        ez = jnp.where(mask3, jnp.exp(z), 0.0)
        alpha_c = ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
        alpha_ref[:] = alpha_c
        w = jnp.dot(
            alpha_c.reshape(b * k, h).astype(g.dtype), e_ref[:],
            preferred_element_type=F32,
        ).reshape(b, k, hcd)
        out_ref[:] = (w * g.astype(F32)).sum(axis=1).astype(out_ref.dtype)

    def run_compact(xl, xr, att):
        blk = pg._block_rows(csr.idx.shape[1])
        g3, xr_p, _, mask_f, n_dst, n_pad, k, hcd = pg._prep(
            xl, xr, keep, csr, blk
        )
        att_f = att.reshape(hc).astype(xl.dtype)
        group = jnp.arange(hc) // ch
        attc = att_f[:, None] * (
            group[:, None] == jnp.arange(heads)[None, :]
        ).astype(xl.dtype)                                   # (HC, H)
        e = (jnp.arange(heads)[:, None] == group[None, :]).astype(
            xl.dtype
        )                                                    # (H, HC)
        out, alpha_c = pl.pallas_call(
            functools.partial(fwd_compact, slope=slope),
            grid=(n_pad // blk,),
            in_specs=[
                pl.BlockSpec((blk, k, hcd), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, hcd), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, k), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hcd, heads), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((heads, hcd), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((blk, hcd), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, hcd), xr.dtype),
                jax.ShapeDtypeStruct((n_pad, k, heads), F32),
            ],
        )(g3, xr_p, mask_f, attc, e)
        return out[:n_dst], alpha_c[:n_dst]

    # ---------------- correctness vs production ----------------
    base_fn = jax.jit(
        lambda xl, xr, att: pg.gatv2_edge_stage_pallas(
            xl, xr, att, keep, csr, csr_t, config
        )
    )
    cmp_fn = jax.jit(run_compact)

    print("compiling base...", flush=True)
    out_base = np.asarray(base_fn(xl, xr, att), np.float32)
    print("compiling compact...", flush=True)
    out_cmp, _ = cmp_fn(xl, xr, att)
    out_cmp = np.asarray(out_cmp, np.float32)
    err = np.max(np.abs(out_base - out_cmp)) / max(
        1e-9, np.max(np.abs(out_base))
    )
    print(f"compact vs base rel err: {err:.3e}")

    # ---------------- chained timing ----------------
    N = 100
    floor = _round_trip_floor_ms(N)

    def chain(stage):
        @jax.jit
        def f(xl):
            def body(i, carry):
                xl, acc = carry
                out = stage(xl)
                acc2 = acc + out.astype(F32).sum()
                return (xl + (acc2 * 1e-30).astype(xl.dtype), acc2)
            return jax.lax.fori_loop(0, N, body, (xl, 0.0))[1]
        return f

    base_chain = chain(
        lambda x: pg.gatv2_edge_stage_pallas(
            x, xr, att, keep, csr, csr_t, config
        )
    )
    cmp_chain = chain(lambda x: run_compact(x, xr, att)[0])

    t_base = _chained_ms(lambda: base_chain(xl), N) - floor
    t_cmp = _chained_ms(lambda: cmp_chain(xl), N) - floor
    print(json.dumps({
        "floor_ms": round(floor, 4),
        "base_edge_stage_ms": round(t_base, 4),
        "compact_edge_stage_ms": round(t_cmp, 4),
        "speedup": round(t_base / t_cmp, 3),
    }))


if __name__ == "__main__":
    main()
