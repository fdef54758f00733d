"""Banded Pallas edge-stage kernel: host banding + interpret parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.ops import coo_to_padded_csr, PaddedCSR
from segger_tpu.ops.gather_agg import csr_softmax
from segger_tpu.ops.pallas.banded import (
    band_graph, banded_edge_stage, BLOCK, WINDOW, K_BAND,
)
from segger_tpu.data.neighbors_host import kdtree_neighbors


@pytest.fixture(scope="module")
def banded_setup():
    rng = np.random.default_rng(0)
    n = 6000
    pos = rng.uniform(0, 200, (n, 2))
    strip = np.floor(pos[:, 1] / 5.0).astype(np.int64)
    order = np.lexsort((pos[:, 0], strip))
    pos = pos[order]
    src, dst = kdtree_neighbors(pos, max_k=5, max_dist=5.0)
    csr = coo_to_padded_csr(dst, src, n_dst=n, k=8)
    return n, csr


def test_band_graph_strip_major_fits(banded_setup):
    n, csr = banded_setup
    lo, idxl, mask, ok = band_graph(csr, n_src=n)
    assert ok
    assert idxl.shape[1] == K_BAND
    assert (lo >= 0).all() and (lo + WINDOW <= max(n, WINDOW)).all()
    # every valid local index maps back to the original global index
    glob = idxl + lo.repeat(BLOCK)[:, None]
    orig = np.asarray(csr.idx)
    om = np.asarray(csr.mask)
    np.testing.assert_array_equal(
        glob[: om.shape[0], : om.shape[1]][om], orig[om]
    )


def test_band_graph_rejects_wide_rows(rng):
    """A scrambled (non-local) graph exceeds the window and is rejected."""
    n = 10000
    dst = np.repeat(np.arange(n), 2)
    src = rng.integers(0, n, dst.size)  # global-range neighbors
    csr = coo_to_padded_csr(dst, src, n_dst=n, k=4)
    _, _, _, ok = band_graph(csr, n_src=n)
    assert not ok


def test_banded_kernel_interpret_parity(banded_setup):
    n, csr = banded_setup
    lo, idxl, mask, ok = band_graph(csr, n_src=n)
    assert ok
    rng = np.random.default_rng(1)
    h, c = 2, 16
    hc = h * c
    xl = jnp.asarray(rng.normal(size=(n, hc)).astype(np.float32))
    n_pad = idxl.shape[0]
    xr = jnp.asarray(
        np.pad(
            rng.normal(size=(n, hc)).astype(np.float32),
            ((0, n_pad - n), (0, 0)),
        )
    )
    att = jnp.asarray(rng.normal(size=(h, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(hc,)).astype(np.float32))

    got = banded_edge_stage(
        xl, xr, jnp.asarray(lo), jnp.asarray(idxl), jnp.asarray(mask),
        att, bias, heads=h, interpret=True,
    )

    glob = np.clip(idxl + lo.repeat(BLOCK)[:, None], 0, n - 1)
    g = jnp.take(xl, jnp.asarray(glob), axis=0)
    p = g + xr[:, None, :]
    s = jnp.where(p > 0, p, 0.2 * p).reshape(n_pad, K_BAND, h, c)
    logits = (s * att[None, None]).sum(-1)
    ref = PaddedCSR(
        idx=jnp.zeros_like(jnp.asarray(idxl)), mask=jnp.asarray(mask)
    )
    alpha = csr_softmax(logits, ref)
    gh = g.reshape(n_pad, K_BAND, h, c)
    want = (
        jnp.einsum("bkh,bkhc->bhc", alpha, gh).reshape(n_pad, hc) + bias
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )
