"""Pallas fused GATv2 attention kernel: parity vs the XLA edge stage
(interpret mode — the TPU lowering is gated on Mosaic gather support,
see ops/pallas/gatv2_attn.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.ops import coo_to_padded_csr, csr_softmax, PaddedCSR
from segger_tpu.ops.pallas import gatv2_attention


@pytest.mark.parametrize("heads,ch,k", [(2, 16, 8), (1, 32, 4)])
def test_pallas_gatv2_matches_xla(rng, heads, ch, k):
    n_src, n_dst = 300, 256
    hc = heads * ch
    dst = rng.integers(0, n_dst, 900)
    src = rng.integers(0, n_src, 900)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst, k=k)
    xl = jnp.asarray(rng.normal(size=(n_src, hc)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(n_dst, hc)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(heads, ch)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(hc,)).astype(np.float32))
    idx, mask = jnp.asarray(csr.idx), jnp.asarray(csr.mask)

    # XLA reference (the GATv2Conv edge stage)
    g = jnp.take(xl, idx, axis=0)
    s = g + xr[:, None, :]
    s = jnp.where(s > 0, s, 0.2 * s).reshape(n_dst, -1, heads, ch)
    logits = (s * att[None, None]).sum(-1)
    alpha = csr_softmax(logits, PaddedCSR(idx=idx, mask=mask))
    gh = g.reshape(n_dst, -1, heads, ch)
    want = (
        jnp.einsum("bkh,bkhc->bhc", alpha, gh).reshape(n_dst, hc) + bias
    )

    got = gatv2_attention(
        xl, xr, idx, mask, att, bias, heads=heads, block_rows=64,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_pallas_gatv2_nondivisible_rows(rng):
    """Row counts not divisible by block_rows are padded internally."""
    heads, ch, k = 2, 8, 4
    hc = heads * ch
    n_src, n_dst = 50, 37
    dst = rng.integers(0, n_dst, 100)
    src = rng.integers(0, n_src, 100)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst, k=k)
    xl = jnp.asarray(rng.normal(size=(n_src, hc)).astype(np.float32))
    xr = jnp.asarray(rng.normal(size=(n_dst, hc)).astype(np.float32))
    att = jnp.asarray(rng.normal(size=(heads, ch)).astype(np.float32))
    bias = jnp.zeros(hc, jnp.float32)
    out = gatv2_attention(
        xl, xr, jnp.asarray(csr.idx), jnp.asarray(csr.mask), att, bias,
        heads=heads, block_rows=16, interpret=True,
    )
    assert out.shape == (n_dst, hc)
    assert np.isfinite(np.asarray(out)).all()
