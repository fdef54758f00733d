"""Banded Pallas edge-stage kernel: the whole GATv2 edge stage in VMEM.

Requires *banded* graph structure: rows sorted so that every 256-row
destination block's neighbors fall in one 4096-row source window.  The
host achieves this with strip-major ordering (sort by max_dist-height
y-strip, then x): for a radius-bounded kNN graph the band is ~3 strip
populations wide (measured ~1.2k rows at Xenium density — 4096 gives
3x headroom; the builder *verifies* and the caller falls back to the
XLA path when the band is too wide).

Why these shapes: Mosaic's only dynamic gather is ``tpu.dynamic_gather``
with input/indices/output of identical 2-D shape.  Choosing
``B * K == W`` (256 * 16 == 4096) makes the flattened per-block gather
exactly that shape: window (W, HC) gathered by (B·K,) indices
broadcast to (W, HC).

Per grid step: one async copy HBM->VMEM of the source window, then
gather + attention + masked softmax + weighted sum entirely in VMEM —
the (N, K, H·C) tensor never exists in HBM, which is what bounds the
XLA path (docs/design.md §2).

STATUS — interpret-mode validated; TPU compilation blocked by a Mosaic
backend bug in this toolchain: ``tpu.dynamic_gather`` (the only dynamic
gather Mosaic lowers) compiles for 8-row operands but crashes the
compile helper for >=256 rows (minimal repro: a bare take_along_axis
kernel at (256, 128); same crash at (4096, 128); (8, 128) works).  The
banding design itself is verified feasible: strip-major ordering bounds
every 256-row block's neighbor window to ~1.2k rows at Xenium density,
zero spill at W=4096.  Revisit on a newer libtpu/Mosaic
(``tools/banded_retest.py``).  Retest history: jax 0.9.0 / libtpu
0.0.34 (2026-08-18, re-confirmed 2026-08-19, 2026-08-20) — still
crashes at >=256 rows.

WORKAROUNDS MEASURED DEAD (round 5, tools/banded_workarounds.py): a
per-row async-copy gather runs 33x slower than the XLA gather
(17.2M vs ~570M rows/s — DMA-descriptor latency); a one-hot-MXU
in-VMEM gather hits the same Mosaic compile-helper crash at every
operand size tried; a pltpu.roll butterfly/select network is provably
incapable of duplicate-gather (interpret-refuted before TPU time).
There is no path below the XLA gather row rate on this toolchain.
"""
from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from ..padded_csr import PaddedCSR

_NEG_INF = -1e30
BLOCK = 256
WINDOW = 4096
K_BAND = WINDOW // BLOCK  # 16


def band_graph(
    csr: PaddedCSR, n_src: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, bool]:
    """Host-side banding: per-block window starts + window-local indices.

    Returns (lo, idx_local, mask, ok).  ``ok`` is False when any block's
    neighbor span exceeds WINDOW (caller falls back to the XLA path).
    Rows are assumed already locality-sorted (strip-major / Morton).
    """
    idx = np.asarray(csr.idx)
    mask = np.asarray(csr.mask)
    n_dst, k = idx.shape
    if k > K_BAND:
        return None, None, None, False
    # pad rows to BLOCK multiple and K to K_BAND
    n_pad = -(-n_dst // BLOCK) * BLOCK
    idx_p = np.zeros((n_pad, K_BAND), np.int32)
    mask_p = np.zeros((n_pad, K_BAND), bool)
    idx_p[:n_dst, :k] = idx
    mask_p[:n_dst, :k] = mask
    n_blocks = n_pad // BLOCK

    lo = np.zeros(n_blocks, np.int32)
    max_lo = max(n_src - WINDOW, 0)
    ok = True
    for b in range(n_blocks):
        blk_idx = idx_p[b * BLOCK : (b + 1) * BLOCK]
        blk_mask = mask_p[b * BLOCK : (b + 1) * BLOCK]
        if blk_mask.any():
            smin = int(blk_idx[blk_mask].min())
            smax = int(blk_idx[blk_mask].max())
            if smax - smin + 1 > WINDOW:
                ok = False
                break
            lo[b] = min(max(smin, 0), max_lo)
            if smax >= lo[b] + WINDOW:
                lo[b] = min(smax - WINDOW + 1, max_lo)
    if not ok:
        return None, None, None, False
    local = idx_p - lo.repeat(BLOCK)[:, None]
    local = np.clip(local, 0, WINDOW - 1).astype(np.int32)
    return lo, local, mask_p, True


def _kernel(lo_ref, xr_ref, idxl_ref, mask_ref, att_ref, bias_ref,
            xl_hbm, out_ref, win, sem, *, heads: int, ch: int,
            slope: float):
    b = pl.program_id(0)
    hc = heads * ch
    copy = pltpu.make_async_copy(
        xl_hbm.at[pl.ds(lo_ref[b], WINDOW), :], win, sem
    )
    copy.start()
    copy.wait()

    w = win[:]                                     # (W, HC)
    flat_idx = idxl_ref[:].reshape(WINDOW)         # B*K == W
    g = jnp.take_along_axis(
        w, jax.lax.broadcast_in_dim(
            flat_idx, (WINDOW, hc), (0,)
        ), axis=0,
    )                                              # (W, HC)
    g3 = g.reshape(BLOCK, K_BAND, hc)
    xr = xr_ref[:]                                 # (B, HC)
    p = g3 + xr[:, None, :]
    s = jnp.where(p > 0, p, slope * p)
    sh = s.reshape(BLOCK, K_BAND, heads, ch)
    att = att_ref[:]                               # (H, C)
    logits = (sh * att[None, None]).sum(-1)        # (B, K, H)
    m = mask_ref[:][..., None]
    z = jnp.where(m, logits, _NEG_INF)
    z = z - z.max(axis=1, keepdims=True)
    ez = jnp.where(m, jnp.exp(z), 0.0)
    alpha = ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    gh = g3.reshape(BLOCK, K_BAND, heads, ch)
    # elementwise + K-reduce (Mosaic's dot lowering rejects the batched
    # 4-D einsum form)
    out = (alpha[..., None] * gh).sum(axis=1)      # (B, H, C)
    out_ref[:] = out.reshape(BLOCK, hc) + bias_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("heads", "slope", "interpret"),
)
def banded_edge_stage(
    xl: jnp.ndarray,
    xr: jnp.ndarray,
    lo: jnp.ndarray,
    idx_local: jnp.ndarray,
    mask: jnp.ndarray,
    att: jnp.ndarray,
    bias: jnp.ndarray,
    heads: int,
    slope: float = 0.2,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward edge stage over a banded graph (see band_graph).

    xl : (N_src, HC) — N_src must be >= WINDOW
    xr : (N_pad, HC) with N_pad % BLOCK == 0
    lo : (N_pad/BLOCK,) int32 window starts
    idx_local/mask : (N_pad, K_BAND)
    """
    n_pad, k = idx_local.shape
    assert k == K_BAND and n_pad % BLOCK == 0
    hc = xl.shape[-1]
    ch = hc // heads
    n_blocks = n_pad // BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, hc), lambda b, lo_ref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, K_BAND), lambda b, lo_ref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, K_BAND), lambda b, lo_ref: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((heads, ch), lambda b, lo_ref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc,), lambda b, lo_ref: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # xl stays in HBM
        ],
        out_specs=pl.BlockSpec((BLOCK, hc), lambda b, lo_ref: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WINDOW, hc), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, ch=ch, slope=slope
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, hc), xl.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lo, xr, idx_local, mask, att, bias, xl)
