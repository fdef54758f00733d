"""Pallas TPU kernel: fused GATv2 edge attention + aggregation.

Computes, for each destination row block, the whole edge-stage of GATv2
in VMEM — gather of source features, LeakyReLU attention logits, masked
row softmax, and the weighted neighbor sum:

    s_ijh   = leaky_relu(xl[idx[i,j]] + xr[i])          (VPU)
    e_ijh   = sum_c s_ijhc * att[h,c]                   (VPU)
    alpha   = masked softmax_j(e_ijh)                   (VPU)
    out_ihc = sum_j alpha_ijh * xl[idx[i,j]]_hc + bias  (VPU)

The source feature table ``xl`` lives wholly in VMEM (one copy shared by
all grid steps); the (N, K, H*C) gathered tensor that the XLA path
relies on the fuser to eliminate is never formed at all here.

STATUS — experimental, interpret-mode validated.  The Mosaic TPU
compiler currently lowers ``lax.gather`` only as ``tpu.dynamic_gather``
with input/indices/output of identical 2D shape (take_along_axis within
same-shape arrays; jax/_src/pallas/mosaic/lowering.py gather rule), so
the arbitrary row gather this kernel needs does not yet compile to TPU.
The production edge stage on TPU is therefore
``ops.pallas.postgather`` — the gather itself stays in XLA (written to
HBM exactly once) and everything downstream is fused into one Pallas
pass.  The stage is HBM-traffic bound, not MXU bound; bench.py reports
the measured fraction of the HBM roofline (see BENCH_r*.json for the
current number).  Revisit this fully-fused variant when Mosaic grows
general dynamic gather, or via per-row async-copy DMA for the large-K
boundary aggregation.

This is the framework's hot edge-stage op (reference hot loop:
PyG GATv2Conv + torch_scatter, src/segger/models/ist_encoder.py:109-134).
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG_INF = -1e30
# VMEM budget for the resident source table (bytes); v5e has ~16 MB/core
_XL_VMEM_BUDGET = 8 * 1024 * 1024


def pallas_available() -> bool:
    return _HAS_PLTPU


def _kernel(xl_ref, xr_ref, idx_ref, mask_ref, att_ref, bias_ref,
            out_ref, *, heads: int, ch: int, negative_slope: float):
    xl = xl_ref[:]                       # (Ns, H*C) resident
    xr = xr_ref[:]                       # (B, H*C) this block
    idx = idx_ref[:]                     # (B, K)
    mask = mask_ref[:]                   # (B, K) bool
    att = att_ref[:]                     # (H, C)

    b, k = idx.shape
    hc = xl.shape[-1]
    # Mosaic supports dynamic row gather in take_along_axis form
    # (indices broadcast to the output shape)
    flat_idx = jnp.broadcast_to(idx.reshape(-1)[:, None], (b * k, hc))
    g = jnp.take_along_axis(xl, flat_idx, axis=0).reshape(b, k, hc)
    s = g + xr[:, None, :]
    s = jnp.where(s > 0, s, negative_slope * s)
    s = s.reshape(*s.shape[:-1], heads, ch)
    logits = (s * att[None, None]).sum(-1)          # (B, K, H)

    m = mask[..., None]
    z = jnp.where(m, logits, _NEG_INF)
    z = z - jax.lax.stop_gradient(z.max(axis=1, keepdims=True))
    ez = jnp.where(m, jnp.exp(z), 0.0)
    denom = ez.sum(axis=1, keepdims=True)
    alpha = ez / jnp.maximum(denom, 1e-30)          # (B, K, H)

    gh = g.reshape(*g.shape[:-1], heads, ch)        # (B, K, H, C)
    out = jnp.einsum(
        "bkh,bkhc->bhc", alpha, gh,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.reshape(out.shape[0], heads * ch) + bias_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("heads", "negative_slope", "block_rows",
                     "interpret"),
)
def gatv2_attention(
    xl: jnp.ndarray,
    xr: jnp.ndarray,
    idx: jnp.ndarray,
    mask: jnp.ndarray,
    att: jnp.ndarray,
    bias: jnp.ndarray,
    heads: int,
    negative_slope: float = 0.2,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused edge attention + aggregation (forward only).

    Parameters
    ----------
    xl : (N_src, H*C) projected source features
    xr : (N_dst, H*C) projected destination features
    idx, mask : (N_dst, K) padded-CSR neighbor table
    att : (1, H, C) or (H, C) attention vector
    bias : (H*C,)
    """
    n_dst, k = idx.shape
    hc = xl.shape[-1]
    ch = hc // heads
    att2 = att.reshape(heads, ch)

    if n_dst % block_rows:
        pad = block_rows - n_dst % block_rows
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    n_pad = idx.shape[0]
    grid = (n_pad // block_rows,)

    vmem = (
        pltpu.VMEM
        if (_HAS_PLTPU and not interpret)
        else pl.ANY
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, ch=ch, negative_slope=negative_slope
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, hc), xl.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((xl.shape[0], hc), lambda i: (0, 0),
                         memory_space=vmem),
            pl.BlockSpec((block_rows, hc), lambda i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((block_rows, k), lambda i: (i, 0),
                         memory_space=vmem),
            pl.BlockSpec((heads, ch), lambda i: (0, 0),
                         memory_space=vmem),
            pl.BlockSpec((hc,), lambda i: (0,), memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((block_rows, hc), lambda i: (i, 0),
                               memory_space=vmem),
        interpret=interpret,
    )(xl, xr, idx, mask, att2, bias)
    return out[:n_dst]


def fits_vmem(n_src: int, hc: int, dtype=jnp.float32) -> bool:
    """Whether the resident source table fits the kernel's VMEM budget."""
    return n_src * hc * jnp.dtype(dtype).itemsize <= _XL_VMEM_BUDGET
