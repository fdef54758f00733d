"""Edge-stage kernel cost ladder: measure WHERE the per-layer ~0.78 ms
forward kernel time sits, and test the dense lane-packed softmax.

The r4 compact (B, K, H) rewrite measured FLAT vs the lane-replicated
chain: Mosaic tiles the (K=8, H=2) minor dims of a 3-D f32 array into
one (8, 128) vreg per destination row, so a compact pass costs exactly
as many vector ops as a full-width (B, K, HC) pass.  Dense packing —
reshaping the (B*K, H) chain values to ((B*K*H)/128, 128) so the whole
softmax runs on ~4 vregs per block — is the only layout that actually
cuts the op count (64x).  Whether Mosaic's relayout for that reshape is
cheap is an empirical question; this ladder answers it.

Variants (all nokeep-mode, bench shapes, chained timing):

  v0_dma      load g, write row sums            -> DMA + minimal VPU
  v1_leaky    + p = g + xr, s = leakyrelu(p)    -> the full-width chain
  v2_matmuls  + attc/expand matmuls, no softmax -> MXU cost
  v3_compact  the current production kernel     -> + (B,K,H) softmax
  v4_packed   softmax chain densely packed to (rows, 128) via reshape,
              pltpu.roll max-tree + sum/broadcast mask-matmuls

    timeout 1500 python tools/kernel_ladder.py
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
    NEG = -1e30

    tile = build_tile()
    csr = tile.tt
    n_tx = tile.tx_gene.shape[0]
    hc, heads = 128, 2
    ch = hc // heads
    rng = np.random.default_rng(0)
    xl = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    xr = jnp.asarray(rng.normal(size=(n_tx, hc)), jnp.bfloat16)
    att = jnp.asarray(rng.normal(size=(heads, ch)), jnp.bfloat16)
    slope = 0.2
    keep = pg.no_dropout_keep(heads, jnp.bfloat16)

    blk = pg._block_rows(csr.idx.shape[1])
    g3, xr_p, _, mask_f, n_dst, n_pad, k, _ = pg._prep(
        xl, xr, keep, csr, blk
    )
    attc, e = pg._head_matrices(att, xl.dtype)

    # ---------------- kernel variants ----------------
    def v0_dma(g_ref, xr_ref, mask_ref, attc_ref, e_ref, out_ref,
               alpha_ref):
        g = g_ref[:]
        out_ref[:] = g.astype(F32).sum(axis=1).astype(out_ref.dtype)
        alpha_ref[:] = (mask_ref[:][..., None]
                        * jnp.ones((1, 1, heads), F32))

    def v1_leaky(g_ref, xr_ref, mask_ref, attc_ref, e_ref, out_ref,
                 alpha_ref):
        g = g_ref[:]
        p = g + xr_ref[:][:, None, :]
        s = jnp.where(p.astype(F32) > 0, p, slope * p)
        out_ref[:] = s.astype(F32).sum(axis=1).astype(out_ref.dtype)
        alpha_ref[:] = (mask_ref[:][..., None]
                        * jnp.ones((1, 1, heads), F32))

    def v2_matmuls(g_ref, xr_ref, mask_ref, attc_ref, e_ref, out_ref,
                   alpha_ref):
        g = g_ref[:]
        b = g.shape[0]
        p = g + xr_ref[:][:, None, :]
        s = jnp.where(p.astype(F32) > 0, p, slope * p)
        lc = jnp.dot(
            s.reshape(b * k, hc), attc_ref[:], preferred_element_type=F32
        ).reshape(b, k, heads)
        alpha_c = lc * mask_ref[:][..., None]   # stand-in for softmax
        alpha_ref[:] = alpha_c
        w = pg._keep3(alpha_c, e_ref[:])
        out_ref[:] = (w * g.astype(F32)).sum(axis=1).astype(out_ref.dtype)

    v3_compact = functools.partial(pg._fwd_kernel_nokeep, slope=slope)

    def v4_packed(g_ref, xr_ref, mask_ref, attc_ref, e_ref, bmax_ref,
                  bsum_ref, out_ref, alpha_ref):
        g = g_ref[:]
        b = g.shape[0]
        p = g + xr_ref[:][:, None, :]
        s = jnp.where(p.astype(F32) > 0, p, slope * p)
        lc = jnp.dot(
            s.reshape(b * k, hc), attc_ref[:], preferred_element_type=F32
        )                                          # (B*K, H)
        rows = (b * k * heads) // 128
        zp = lc.reshape(rows, 128)                 # dense relayout
        mp = jnp.broadcast_to(
            mask_f_dummy := mask_ref[:][:, :, None], (b, k, heads)
        ).reshape(rows, 128) > 0
        z = jnp.where(mp, zp, NEG)
        # segment = 16 contiguous lanes (one destination's (k, h) pairs,
        # k-major); per-(segment, h) max via stride-H roll tree — exact
        # at the k=0 lanes, then mask + broadcast matmul
        m = z
        for d in (2, 4, 8):
            m = jnp.maximum(m, pltpu.roll(m, -d, 1))
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        m0 = jnp.where(lane % 16 < heads, m, 0.0)
        mb = jnp.dot(m0, bmax_ref[:], preferred_element_type=F32)
        ez = jnp.where(mp, jnp.exp(z - mb), 0.0)
        den = jnp.dot(ez, bsum_ref[:], preferred_element_type=F32)
        alpha_p = ez / jnp.maximum(den, 1e-30)
        alpha_c = alpha_p.reshape(b * k, heads)    # relayout back
        alpha_ref[:] = alpha_c.reshape(b, k, heads)
        w = pg._keep3(alpha_c.reshape(b, k, heads), e_ref[:])
        out_ref[:] = (w * g.astype(F32)).sum(axis=1).astype(out_ref.dtype)

    # host matrices for the packed reductions (128 lanes = 8 segments
    # of 16 = (k-major k*H+h))
    lane = np.arange(128)
    seg = lane // 16
    hh = lane % heads
    kk = (lane % 16) // heads
    bmax = ((seg[:, None] == seg[None, :])
            & (hh[:, None] == hh[None, :])
            & (kk[:, None] == 0)).astype(np.float32)
    bsum = ((seg[:, None] == seg[None, :])
            & (hh[:, None] == hh[None, :])).astype(np.float32)
    bmax_j = jnp.asarray(bmax)
    bsum_j = jnp.asarray(bsum)

    base_specs = pg._fwd_specs(blk, k, hc, heads, "nokeep")
    out_specs = [
        pl.BlockSpec((blk, hc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, hc), xr.dtype),
        jax.ShapeDtypeStruct((n_pad, k, heads), F32),
    ]

    def call(kern, extra_specs=(), extra_ops=()):
        def fn(g3):
            return pl.pallas_call(
                kern,
                grid=(n_pad // blk,),
                in_specs=base_specs + list(extra_specs),
                out_specs=out_specs,
                out_shape=out_shape,
            )(g3, xr_p, mask_f, attc, e, *extra_ops)
        return fn

    mm_spec = pl.BlockSpec((128, 128), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    variants = {
        "v0_dma": call(v0_dma),
        "v1_leaky": call(v1_leaky),
        "v2_matmuls": call(v2_matmuls),
        "v3_compact": call(v3_compact),
        "v4_packed": call(v4_packed, [mm_spec, mm_spec],
                          [bmax_j, bsum_j]),
    }

    # correctness of v4 vs v3
    try:
        o3, a3 = jax.jit(variants["v3_compact"])(g3)
        o4, a4 = jax.jit(variants["v4_packed"])(g3)
        err = float(jnp.max(jnp.abs(
            a3[:n_dst] - a4[:n_dst]
        )))
        print(f"v4 vs v3 alpha max abs err: {err:.3e}", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"v4 FAILED to compile/run: {type(ex).__name__}: "
              f"{str(ex)[:400]}", flush=True)
        variants.pop("v4_packed")

    N = 100
    floor = _round_trip_floor_ms(N)
    res = {"floor_ms": round(floor, 4)}
    for name, fn in variants.items():
        @jax.jit
        def chain(g3, fn=fn):
            def body(i, carry):
                g3, acc = carry
                out, _ = fn(g3)
                acc2 = acc + out.astype(F32).sum()
                return (g3 + (acc2 * 1e-30).astype(g3.dtype), acc2)
            return jax.lax.fori_loop(0, N, body, (g3, 0.0))[1]
        res[name + "_ms"] = round(
            _chained_ms(lambda: chain(g3), N) - floor, 4
        )
        print(name, res[name + "_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
