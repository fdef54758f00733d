"""Post-gather fused GATv2 edge stage (Pallas TPU kernel).

The edge stage (reference hot loop: PyG GATv2Conv + torch_scatter,
src/segger/models/ist_encoder.py:109-134) is HBM-traffic bound: the
gathered ``(N*K, H*C)`` tensor dominates.  Mosaic on this toolchain
cannot lower any dynamic gather >= 128 rows (see ops/pallas/banded.py
for the repro), so the gather itself stays in XLA — ``jnp.take`` writes
the gathered tensor to HBM exactly once — and THIS kernel fuses every
downstream op (add-xr, leaky-relu, per-head attention logits, masked
softmax over the K slots, dropout multiply, weighted sum) into a single
pass that streams that tensor through VMEM once.  The XLA path instead
materializes the p/s/logits/alpha-expanded chain, re-streaming
~(N*K, H*C)-sized intermediates several times per layer.

Layout strategy (the part that makes this fast on TPU):

- Work per destination-block of B rows with all K neighbor slots
  resident: every tensor in flight is (B, K, HC) with HC=128 lanes —
  full lane utilization, and B*K is sized so blocks stay ~1 MB.
- Per-head attention logits are *lane-replicated*: instead of forming a
  ``(·, H)`` tensor (2 of 128 lanes used — the ~2% lane-utilization
  trap measured on the XLA path, docs/design.md §2), we compute
  ``L = s @ AM`` where ``AM[i, j] = att_flat[i] * [head(i) == head(j)]``
  is a host-built (HC, HC) matrix.  ONE MXU matmul per block (not one
  per slot — small serialized matmuls are latency-bound) yields logits
  already broadcast across each head's C lanes, so the softmax over the
  K axis and the weighted sum stay fully vectorized.
- Dropout keep-masks arrive compactly as ``(B, K, H)`` and are lane-
  expanded by one (H, HC) matmul (E[h, j] = [head(j) == h]).
- Softmax statistics are always f32 even when features are bf16.

Backward: same blocking; the forward saves TWO residuals — the padded
gathered tensor (re-gathering would cost an extra random-read +
sequential-write round trip of the stage's largest tensor) and the
compact (N, K, H) f32 softmax coefficients (recomputing them was the
backward's dominant VPU cost: mask/matmul/max/exp/sum/div chains over
(N, K, HC) f32).  The backward kernel lane-expands alpha with one MXU
matmul, recomputes only the cheap p/sign chain, and emits
dgather/dxr/datt/dkeep in one pass.  dxl is then a scatter-free
transpose-space gather in XLA (csr_t) whose invalid slots route to a
guaranteed-zero padded row (alpha == 0 there), so it sums without a
full-size mask select.  Forward and backward share one block size so
the residual's padding is valid for both grids.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - exercised on TPU images
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..padded_csr import PaddedCSR

_NEG_INF = -1e30
_F32 = jnp.float32


import os

_BLOCK_EDGE_ROWS = int(os.environ.get("SEGGER_PG_BLOCK_EDGES", "2048"))


def _block_rows(k: int) -> int:
    """Destination rows per grid step.

    B*K edge rows per block; (B, K, HC) f32 tensors in flight are then
    ~1 MB at the 2048 default.  Sizing is overhead-vs-VMEM: at 1024 the
    measured per-grid-step cost (~1.9 us against ~0.4 us of DMA+compute)
    left the edge-stage kernels at ~150 GB/s on a ~600 GB/s chip; 2048
    halves the step count.  One size serves the forward and the
    backward: the backward holds the most tensors (the VMEM ceiling)
    and reuses the forward-padded gathered residual (same grid).
    Override with SEGGER_PG_BLOCK_EDGES for tuning runs."""
    return max(8, min(1024, (_BLOCK_EDGE_ROWS // max(k, 1)) // 8 * 8))


def _head_matrices(att: jnp.ndarray, dtype) -> Tuple[jnp.ndarray, ...]:
    """Build the head-compaction/expansion matrices for ``att`` (H, C).

    ATTC : (HC, H) — s @ ATTC gives COMPACT per-head logits (the
                     lane-packed softmax input; docs/design.md §2).
    E    : (H, HC) — head -> lane-group expander (also its transpose is
                     the per-head summing compactor used by the
                     backward's dA).
    """
    heads, ch = att.shape
    hc = heads * ch
    group = jnp.arange(hc) // ch
    att_f = att.reshape(hc).astype(dtype)
    e = (jnp.arange(heads)[:, None] == group[None, :]).astype(dtype)
    attc = att_f[:, None] * e.T
    return attc, e


def _alpha_c(g, xr, mask3, attc, slope):
    """Lane-packed masked per-head attention over the K axis.

    The softmax chain runs at COMPACT (B, K, H) f32 — K on sublanes, so
    every reduction over axis=1 is a native sublane reduction — instead
    of lane-replicated (B, K, HC) (64x redundant VPU work at H=2,
    HC=128; the r3 kernels' stated VPU bound, docs/design.md §2).

    Returns (s, alpha_c): s the (B, K, HC) leaky-relu pre-activation
    (feature dtype), alpha_c the compact (B, K, H) f32 coefficients.
    """
    b, k, hc = g.shape
    p = g + xr[:, None, :]
    # sign test in f32: Mosaic rejects bf16 comparisons
    s = jnp.where(p.astype(_F32) > 0, p, slope * p)
    lc = jnp.dot(
        s.reshape(b * k, hc), attc, preferred_element_type=_F32
    ).reshape(b, k, attc.shape[1])
    z = jnp.where(mask3, lc, _NEG_INF)
    z = z - z.max(axis=1, keepdims=True)
    ez = jnp.where(mask3, jnp.exp(z), 0.0)
    alpha_c = ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    return s, alpha_c


def _keep3(keep, e):
    """(B, K, H) compact multipliers -> (B, K, HC) lane-expanded, f32."""
    b, k, h = keep.shape
    hc = e.shape[1]
    return jnp.dot(
        keep.reshape(b * k, h), e, preferred_element_type=_F32
    ).reshape(b, k, hc)


def _compact_sum(t, e):
    """(B, K, HC) -> per-head sums (B, K, H) f32 via one MXU matmul
    (contraction with E^T sums each head's C lanes)."""
    b, k, hc = t.shape
    return jnp.dot(
        t.reshape(b * k, hc), e.T, preferred_element_type=_F32
    ).reshape(b, k, e.shape[0])


def _fwd_kernel(g_ref, xr_ref, mask_ref, keep_ref, attc_ref, e_ref,
                out_ref, alpha_ref, *, slope: float):
    """One destination block: fused leaky/logits/softmax/weighted-sum.

    g_ref    : (B, K, HC) gathered source features
    xr_ref   : (B, HC)
    mask_ref : (B, K) f32 (1.0 = real edge)
    keep_ref : (B, K, H) f32 dropout multipliers
    attc_ref : (HC, H) attention head-compaction matrix
    e_ref    : (H, HC) head -> lanes expander
    out_ref  : (B, HC)
    alpha_ref: (B, K, H) f32 — compact PRE-dropout softmax coefficients,
               saved as a residual so the backward skips the whole
               logits/softmax recompute chain (its dominant VPU cost)
    """
    g = g_ref[:]
    mask3 = mask_ref[:][..., None] > 0
    _, alpha_c = _alpha_c(g, xr_ref[:], mask3, attc_ref[:], slope)
    alpha_ref[:] = alpha_c
    # fold keep into the COMPACT alpha (tiny (B, K, H) multiply) and
    # lane-expand once — the only full-width consumers are the final
    # multiply and K-sum
    w = _keep3(alpha_c * keep_ref[:].astype(_F32), e_ref[:])
    out = (w * g.astype(_F32)).sum(axis=1)
    out_ref[:] = out.astype(out_ref.dtype)


def _fwd_kernel_nokeep(g_ref, xr_ref, mask_ref, attc_ref, e_ref,
                       out_ref, alpha_ref, *, slope: float):
    """Deterministic-mode forward: no dropout multipliers, so the
    (B, K, H) keep load and its compact multiply are skipped."""
    g = g_ref[:]
    mask3 = mask_ref[:][..., None] > 0
    _, alpha_c = _alpha_c(g, xr_ref[:], mask3, attc_ref[:], slope)
    alpha_ref[:] = alpha_c
    w = _keep3(alpha_c, e_ref[:])
    out = (w * g.astype(_F32)).sum(axis=1)
    out_ref[:] = out.astype(out_ref.dtype)


def _mix32(x):
    """murmur3 fmix32 on int32 lanes (wrapping multiplies, logical
    shifts) — a bijective avalanche mixer."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)          # 0x85ebca6b
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477387)          # 0xc2b2ae35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _prng_keep(seed_ref, b, k, heads, thresh, inv_keep):
    """Regenerable in-kernel dropout multipliers (B, K, H) f32.

    Counter-based: each (row, slot, head) position hashes its global
    flat index with the (2,)-word step seed through two murmur-mix
    rounds, so the backward reproduces the exact keep pattern from the
    seed alone — no (N, K, H) keep tensor ever exists in HBM.
    (Measured: XLA-side bernoulli + keep streaming cost ~11 ms of an
    18 ms dropout-mode forward at bench scale.)  Plain integer ops
    rather than pltpu.prng_random_bits so the stream is identical in
    interpret mode (CPU tests) and compiled Mosaic — the TPU hardware
    PRNG is stubbed to zeros by the Pallas interpreter."""
    shape = (b, k, heads)
    pos = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * (k * heads)
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1) * heads
        + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        + pl.program_id(0) * (b * k * heads)
    )
    x = _mix32(pos ^ seed_ref[0])
    x = _mix32(x ^ (seed_ref[1] + jnp.int32(-1640531527)))
    # compare on the low 31 bits (non-negative int32) — thresh is the
    # inclusive (1 - rate) * 2^31 - 1, quantizing the rate at 2^-31
    r = jnp.bitwise_and(x, jnp.int32(0x7FFFFFFF))
    return jnp.where(r <= jnp.int32(thresh), inv_keep, 0.0).astype(_F32)


def _fwd_kernel_prng(g_ref, xr_ref, mask_ref, seed_ref, attc_ref, e_ref,
                     out_ref, alpha_ref, *, slope: float, heads: int,
                     thresh: int, inv_keep: float):
    """Dropout-mode forward with in-kernel PRNG keep generation."""
    g = g_ref[:]
    b, k, hc = g.shape
    mask3 = mask_ref[:][..., None] > 0
    _, alpha_c = _alpha_c(g, xr_ref[:], mask3, attc_ref[:], slope)
    alpha_ref[:] = alpha_c
    keep = _prng_keep(seed_ref, b, k, heads, thresh, inv_keep)
    # compact alpha*keep, then ONE lane expansion (see _fwd_kernel)
    w = _keep3(alpha_c * keep, e_ref[:])
    out = (w * g.astype(_F32)).sum(axis=1)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_core(g, xr, alpha_c, keep_c, att_lane, e, go, slope):
    """Shared backward math from the STORED compact alpha.

    The forward residual carries alpha, so the logits/softmax chain
    (mask, matmul, max, sub, exp, sum, div — the backward's dominant
    VPU cost) is never recomputed; only the cheap p/s/leak chain is.
    The softmax VJP itself (dA, inner, de) runs at COMPACT (B, K, H)
    f32 — the same lane-packing as the forward — with TWO small
    head-expansion matmuls (de, a_eff) feeding the full-width products.
    alpha is exactly zero on masked slots and padding rows (masked
    softmax), which makes de/dp/dg/dxr/datt zero there with NO explicit
    mask loads or selects.

      dA_c   = per-head-sum(G ⊗ g)                     (compact)
      de_c   = alpha (dA kl - Σ_k alpha dA kl)          (softmax VJP)
      dg     = alpha kl G + de * att * leaky'(p)
      dxr    = Σ_k de * att * leaky'(p)
      datt   = Σ_rows Σ_k de * s                        (att lane layout)
      dkeep_c= alpha_c * dA_c                           (compact)
    """
    dt = xr.dtype
    b, k, hc = g.shape
    go3 = go.astype(_F32)[:, None, :]                  # (B, 1, HC)
    t = (go[:, None, :] * g).astype(dt)                # (B, K, HC)
    dA_c = _compact_sum(t, e)                          # (B, K, H)
    dalpha_c = dA_c if keep_c is None else dA_c * keep_c
    inner_c = (alpha_c * dalpha_c).sum(axis=1, keepdims=True)
    de_c = alpha_c * (dalpha_c - inner_c)
    de = _keep3(de_c, e)                               # (B, K, HC) f32

    p = g + xr[:, None, :]
    p_pos = p.astype(_F32) > 0
    s = jnp.where(p_pos, p, slope * p)
    datt_part = (de * s.astype(_F32)).reshape(b * k, hc).sum(
        axis=0, keepdims=True
    )                                                  # (1, HC)
    leak = jnp.where(p_pos, 1.0, slope)
    dp = de * att_lane[None].astype(_F32) * leak
    dxr = dp.sum(axis=1).astype(dt)
    a_eff_c = alpha_c if keep_c is None else alpha_c * keep_c
    a_eff = _keep3(a_eff_c, e)
    dg = (a_eff * go3 + dp).astype(dt)
    dkeep_c = alpha_c * dA_c
    return dkeep_c, dg, dxr, datt_part


def _bwd_kernel(g_ref, xr_ref, alpha_ref, keep_ref, att_ref, e_ref,
                go_ref,
                dg_ref, dxr_ref, datt_ref, dkeep_ref,
                *, heads: int, slope: float):
    """Backward over one block from the stored compact alpha
    (see _bwd_core)."""
    blk = pl.program_id(0)
    dkeep_c, dg, dxr, datt_part = _bwd_core(
        g_ref[:], xr_ref[:], alpha_ref[:], keep_ref[:].astype(_F32),
        att_ref[:], e_ref[:], go_ref[:], slope,
    )
    dxr_ref[:] = dxr
    dkeep_ref[:] = dkeep_c.astype(dkeep_ref.dtype)
    dg_ref[:] = dg

    @pl.when(blk == 0)
    def _():
        datt_ref[:] = jnp.zeros_like(datt_ref)
    datt_ref[:] = datt_ref[:] + datt_part.astype(datt_ref.dtype)


def _bwd_kernel_prng(g_ref, xr_ref, alpha_ref, seed_ref, att_ref,
                     e_ref, go_ref,
                     dg_ref, dxr_ref, datt_ref,
                     *, heads: int, slope: float, thresh: int,
                     inv_keep: float):
    """Dropout-mode backward: regenerates the forward's keep pattern
    from the seed (same per-block stream), so there is no keep load and
    no dkeep output — keep is not a differentiable input."""
    blk = pl.program_id(0)
    g = g_ref[:]
    b, k, hc = g.shape
    keep_c = _prng_keep(seed_ref, b, k, heads, thresh, inv_keep)
    _, dg, dxr, datt_part = _bwd_core(
        g, xr_ref[:], alpha_ref[:], keep_c, att_ref[:], e_ref[:],
        go_ref[:], slope,
    )
    dxr_ref[:] = dxr
    dg_ref[:] = dg

    @pl.when(blk == 0)
    def _():
        datt_ref[:] = jnp.zeros_like(datt_ref)
    datt_ref[:] = datt_ref[:] + datt_part.astype(datt_ref.dtype)


def _bwd_kernel_nokeep(g_ref, xr_ref, alpha_ref, att_ref, e_ref,
                       go_ref,
                       dg_ref, dxr_ref, datt_ref,
                       *, heads: int, slope: float):
    """Deterministic-mode backward (keep == 1): drops the keep loads,
    the compact keep multiplies, and the dkeep output."""
    blk = pl.program_id(0)
    _, dg, dxr, datt_part = _bwd_core(
        g_ref[:], xr_ref[:], alpha_ref[:], None, att_ref[:], e_ref[:],
        go_ref[:], slope,
    )
    dxr_ref[:] = dxr
    dg_ref[:] = dg

    @pl.when(blk == 0)
    def _():
        datt_ref[:] = jnp.zeros_like(datt_ref)
    datt_ref[:] = datt_ref[:] + datt_part.astype(datt_ref.dtype)


def _pad_rows(x, n_pad, fill=0):
    if x.shape[0] == n_pad:
        return x
    pad = [(0, n_pad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gatv2_edge_stage_pallas(
    xl, xr, att, keep_mask, csr: PaddedCSR, csr_t: PaddedCSR,
    config: tuple,
):
    """Drop-in replacement for ops.edge_stage.gatv2_edge_stage_flat.

    xl : (N_src, HC); xr : (N_dst, HC); att : (H, C)
    keep_mask : one of (see _keep_mode)
        (N_dst, K, H) explicit dropout multipliers;
        (0, 0, H)     no-dropout sentinel (no_dropout_keep);
        (2,) float32  PRNG seed (prng_dropout_seed) — keep multipliers
                      generated inside the kernels, rate from config.
    config : (heads, negative_slope, interpret[, dropout_rate]) — static;
        dropout_rate required in PRNG mode.
    """
    out, _ = _fwd_rule(xl, xr, att, keep_mask, csr, csr_t, config)
    return out


def _keep_mode(keep_mask) -> str:
    """Dispatch on the keep operand:

    'prng'   — a (2,) float32 seed (bitcast uint32 key data; see
               prng_dropout_seed): keep multipliers are generated
               inside the kernels, config carries the rate.
    'nokeep' — the (0, 0, H) no-dropout sentinel (no_dropout_keep).
    'keep'   — a real (N, K, H) multiplier tensor (the pre-PRNG path;
               kept for callers that supply explicit masks).
    """
    if keep_mask.ndim == 1:
        return "prng"
    # the sentinel is empty, so it can never collide with a real
    # (N_dst, K, H) multiplier tensor (N_dst, K >= 1 always)
    return "nokeep" if keep_mask.shape[0] == 0 else "keep"


def no_dropout_keep(heads: int, dtype=jnp.float32):
    """Sentinel keep_mask for deterministic calls: empty (0, 0, H) —
    unambiguous vs any real multiplier tensor.  Never enters a kernel;
    its custom_vjp cotangent is an empty zeros array."""
    return jnp.ones((0, 0, heads), dtype)


def prng_dropout_seed(rng) -> jnp.ndarray:
    """Encode a JAX PRNG key as the (2,) float32 seed operand of the
    in-kernel dropout path (float so the custom_vjp cotangent is a
    plain zeros array)."""
    data = rng if rng.dtype == jnp.uint32 else jax.random.key_data(rng)
    return jax.lax.bitcast_convert_type(
        data.reshape(-1)[:2].astype(jnp.uint32), jnp.float32
    )


def _prng_config(config):
    """-> (inclusive int32 threshold, inv_keep) from config[3] (the
    dropout rate): keep iff (bits & 0x7FFFFFFF) <= thresh, so rate=0
    keeps everything without overflowing int32."""
    rate = config[3]
    keep_p = 1.0 - rate
    thresh = min(int(round(keep_p * 2**31)), 2**31) - 1
    return thresh, float(1.0 / keep_p)


def _prep(xl, xr, keep_mask, csr, blk):
    """Gather + pad to the block multiple.

    Padding is STRICTLY more than n_dst (one extra block when n_dst is
    already a multiple): the backward's dxl gather routes every invalid
    transpose slot at flat position ``n_dst * k`` — a padded row whose
    dg the kernel provably writes as zero — so the (Ns, Kt, HC) gather
    needs no value select and sums unmasked."""
    n_dst, k = csr.idx.shape
    hc = xl.shape[-1]
    n_pad = -(-n_dst // blk) * blk
    if n_pad == n_dst:
        n_pad += blk
    idx = _pad_rows(csr.idx, n_pad)
    # mask stays f32: 16-bit minor-dim broadcast is unsupported in
    # Mosaic, and the array is tiny
    mask_f = _pad_rows(csr.mask, n_pad).astype(jnp.float32)
    # clip mode: PaddedCSR idx are in-range by contract; fill
    # mode would add a full-size bounds select after the gather
    g3 = jnp.take(
        xl, idx.reshape(-1), axis=0, mode="clip"
    ).reshape(n_pad, k, hc)
    xr_p = _pad_rows(xr, n_pad)
    if _keep_mode(keep_mask) != "keep":
        keep = None
    else:
        keep = _pad_rows(keep_mask.astype(xl.dtype), n_pad)
    return g3, xr_p, keep, mask_f, n_dst, n_pad, k, hc


def _fwd_specs(blk, k, hc, heads, mode):
    specs = [
        pl.BlockSpec((blk, k, hc), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),               # g
        pl.BlockSpec((blk, hc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),               # xr
        pl.BlockSpec((blk, k), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),               # mask
    ]
    if mode == "keep":
        specs.append(pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))  # keep
    elif mode == "prng":
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed (2,)
    specs.append(pl.BlockSpec((hc, heads), lambda b: (0, 0),
                              memory_space=pltpu.VMEM))      # attc
    specs.append(pl.BlockSpec((heads, hc), lambda b: (0, 0),
                              memory_space=pltpu.VMEM))      # e
    return specs


def _bwd_specs(blk, k, hc, heads, mode):
    specs = [
        pl.BlockSpec((blk, k, hc), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),               # g
        pl.BlockSpec((blk, hc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),               # xr
        pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),               # alpha_c
    ]
    if mode == "keep":
        specs.append(pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM))  # keep
    elif mode == "prng":
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))  # seed (2,)
    specs.extend([
        pl.BlockSpec((1, hc), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),               # att lanes
        pl.BlockSpec((heads, hc), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),               # e
        pl.BlockSpec((blk, hc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),               # go
    ])
    return specs


def _fwd_rule(xl, xr, att, keep_mask, csr, csr_t, config):
    heads, slope, interpret = config[:3]
    mode = _keep_mode(keep_mask)
    blk = _block_rows(csr.idx.shape[1])
    g3, xr_p, keep, mask_f, n_dst, n_pad, k, hc = _prep(
        xl, xr, keep_mask, csr, blk
    )
    attc, e = _head_matrices(att, xr.dtype)
    if mode == "prng":
        thresh, inv_keep = _prng_config(config)
        seed = jax.lax.bitcast_convert_type(keep_mask, jnp.int32)
        kern = functools.partial(
            _fwd_kernel_prng, slope=slope, heads=heads, thresh=thresh,
            inv_keep=inv_keep,
        )
        operands = (g3, xr_p, mask_f, seed, attc, e)
    elif mode == "nokeep":
        kern = functools.partial(_fwd_kernel_nokeep, slope=slope)
        operands = (g3, xr_p, mask_f, attc, e)
    else:
        kern = functools.partial(_fwd_kernel, slope=slope)
        operands = (g3, xr_p, mask_f, keep, attc, e)
    out, alpha_c = pl.pallas_call(
        kern,
        grid=(n_pad // blk,),
        in_specs=_fwd_specs(blk, k, hc, heads, mode),
        out_specs=[
            pl.BlockSpec((blk, hc), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, k, heads), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, hc), xr.dtype),
            jax.ShapeDtypeStruct((n_pad, k, heads), _F32),
        ],
        interpret=interpret,
    )(*operands)
    # g3 (the padded gathered tensor) and the compact pre-dropout alpha
    # ride as residuals: the backward neither re-gathers nor recomputes
    # the softmax chain; n_src recovers dxl's row count
    return out[:n_dst], (g3, alpha_c, xr, att, keep_mask, csr, csr_t,
                         xl.shape[0])


def _bwd_rule(config, res, G):
    heads, slope, interpret = config[:3]
    g3, alpha_c, xr, att, keep_mask, csr, csr_t, n_src = res
    mode = _keep_mode(keep_mask)
    blk = _block_rows(csr.idx.shape[1])
    n_dst, k = csr.idx.shape
    n_pad, _, hc = g3.shape
    xr_p = _pad_rows(xr, n_pad)
    keep = (
        _pad_rows(keep_mask.astype(g3.dtype), n_pad)
        if mode == "keep" else None
    )
    G_p = _pad_rows(G, n_pad)
    _, e = _head_matrices(att, xr.dtype)
    # att in lane layout: (H, C) flattened is exactly the per-lane
    # attention vector (group(lane) == lane // C)
    att_lane = att.reshape(1, hc).astype(xr.dtype)
    out_specs = [
        pl.BlockSpec((blk, k, hc), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((blk, hc), lambda b: (b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hc), lambda b: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, k, hc), xr.dtype),
        jax.ShapeDtypeStruct((n_pad, hc), xr.dtype),
        jax.ShapeDtypeStruct((1, hc), _F32),
    ]
    if mode == "prng":
        thresh, inv_keep = _prng_config(config)
        seed = jax.lax.bitcast_convert_type(keep_mask, jnp.int32)
        kern = functools.partial(
            _bwd_kernel_prng, heads=heads, slope=slope, thresh=thresh,
            inv_keep=inv_keep,
        )
        operands = (g3, xr_p, alpha_c, seed, att_lane, e, G_p)
    elif mode == "nokeep":
        kern = functools.partial(_bwd_kernel_nokeep, heads=heads,
                                 slope=slope)
        operands = (g3, xr_p, alpha_c, att_lane, e, G_p)
    else:
        kern = functools.partial(_bwd_kernel, heads=heads, slope=slope)
        operands = (g3, xr_p, alpha_c, keep, att_lane, e, G_p)
        out_specs.append(pl.BlockSpec((blk, k, heads),
                                      lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((n_pad, k, heads), xr.dtype))
    in_specs = _bwd_specs(blk, k, hc, heads, mode)
    res = pl.pallas_call(
        kern,
        grid=(n_pad // blk,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if mode != "keep":
        dg3, dxr_p, datt_f = res
        dkeep = jnp.zeros_like(keep_mask)
    else:
        dg3, dxr_p, datt_f, dkeep = res
        dkeep = dkeep[:n_dst].astype(keep_mask.dtype)

    dxr = dxr_p[:n_dst]
    ch = hc // heads
    datt = datt_f.reshape(heads, ch).astype(att.dtype)
    # dxl: transpose-space gather of dg (scatter-free, same as
    # ops/edge_stage.py): csr_t.idx holds flat (dst*K + slot) positions.
    # Invalid transpose slots route to flat position n_dst*k — a padded
    # row the kernel wrote as zero (alpha == 0 there) — so the gathered
    # rows sum WITHOUT a (Ns, Kt, HC)-sized mask select (_prep
    # guarantees n_pad > n_dst).
    dg_flat = dg3.reshape(n_pad * k, hc)
    zero_slot = jnp.int32(n_dst * k)
    t_idx = jnp.where(csr_t.mask, csr_t.idx, zero_slot)
    rows = jnp.take(
        dg_flat, t_idx, axis=0, mode="clip"
    )                                                 # (Ns, Kt, HC)
    dxl = rows.sum(axis=1)
    return dxl.astype(g3.dtype), dxr, datt, dkeep, None, None


gatv2_edge_stage_pallas.defvjp(_fwd_rule, _bwd_rule)


def supported(csr: PaddedCSR, hc: int, heads: int) -> bool:
    """Shape gate for the Pallas path: K bounded so a (B, K, HC) block
    fits VMEM at a useful B, lanes divisible by heads."""
    if not _HAS_PLTPU:
        return False
    k = csr.idx.shape[1]
    if k > 128 or k < 1:
        return False
    if hc % heads != 0 or hc > 512:
        return False
    return True
