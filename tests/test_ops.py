"""Unit tests for the padded-CSR sparse op layer against dense/COO references."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segger_tpu.ops import (
    PaddedCSR,
    coo_to_padded_csr,
    padded_csr_to_coo,
    transpose_csr,
    csr_gather,
    csr_gather_t,
    csr_spmm,
    csr_sddmm,
    csr_softmax,
    csr_max,
    segment_softmax,
)


def random_coo(rng, n_src, n_dst, e):
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    # dedupe (dst, src) pairs so round-trip comparisons are set-equal
    pairs = np.unique(np.stack([dst, src], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def test_coo_roundtrip(rng):
    dst, src = random_coo(rng, 50, 40, 300)
    csr = coo_to_padded_csr(dst, src, n_dst=40)
    d2, s2 = padded_csr_to_coo(csr)
    got = set(zip(d2.tolist(), s2.tolist()))
    want = set(zip(dst.tolist(), src.tolist()))
    assert got == want


def test_coo_empty():
    csr = coo_to_padded_csr(np.array([]), np.array([]), n_dst=7, k=4)
    assert csr.idx.shape == (7, 4)
    assert not csr.mask.any()
    d, s = padded_csr_to_coo(csr)
    assert d.size == 0


def test_k_truncation_and_pad_multiple(rng):
    dst = np.zeros(10, dtype=np.int64)
    src = np.arange(10, dtype=np.int64)
    csr = coo_to_padded_csr(dst, src, n_dst=3, k=5, pad_to_multiple=8)
    assert csr.idx.shape == (3, 8)
    assert csr.mask[0].sum() == 5  # truncated to k


def test_spmm_matches_dense(rng):
    n_src, n_dst, f = 30, 20, 16
    dst, src = random_coo(rng, n_src, n_dst, 200)
    x = rng.normal(size=(n_src, f)).astype(np.float32)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)

    # dense adjacency reference
    A = np.zeros((n_dst, n_src), dtype=np.float32)
    A[dst, src] = 1.0
    want = A @ x
    got = np.asarray(csr_spmm(jnp.asarray(x), csr))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_spmm_weighted_matches_dense(rng):
    n_src, n_dst, f = 25, 15, 8
    dst, src = random_coo(rng, n_src, n_dst, 120)
    x = rng.normal(size=(n_src, f)).astype(np.float32)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    w = rng.normal(size=csr.idx.shape).astype(np.float32)

    A = np.zeros((n_dst, n_src), dtype=np.float32)
    idx, mask = np.asarray(csr.idx), np.asarray(csr.mask)
    for i in range(n_dst):
        for kk in range(idx.shape[1]):
            if mask[i, kk]:
                A[i, idx[i, kk]] += w[i, kk]
    want = A @ x
    got = np.asarray(csr_spmm(jnp.asarray(x), csr, jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sddmm_matches_dense(rng):
    n_src, n_dst, f = 12, 9, 6
    dst, src = random_coo(rng, n_src, n_dst, 60)
    xs = rng.normal(size=(n_src, f)).astype(np.float32)
    xd = rng.normal(size=(n_dst, f)).astype(np.float32)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    e = np.asarray(csr_sddmm(jnp.asarray(xs), jnp.asarray(xd), csr))
    idx, mask = np.asarray(csr.idx), np.asarray(csr.mask)
    for i in range(n_dst):
        for kk in range(idx.shape[1]):
            if mask[i, kk]:
                np.testing.assert_allclose(
                    e[i, kk], xd[i] @ xs[idx[i, kk]], rtol=1e-4, atol=1e-4
                )
            else:
                assert e[i, kk] == 0


def test_csr_softmax_rows_sum_to_one(rng):
    n_dst = 11
    dst, src = random_coo(rng, 13, n_dst, 70)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    logits = jnp.asarray(rng.normal(size=csr.idx.shape).astype(np.float32))
    a = np.asarray(csr_softmax(logits, csr))
    rowsum = a.sum(1)
    has = np.asarray(csr.mask).any(1)
    np.testing.assert_allclose(rowsum[has], 1.0, rtol=1e-5)
    np.testing.assert_allclose(rowsum[~has], 0.0)
    assert (a[~np.asarray(csr.mask)] == 0).all()


def test_csr_softmax_matches_segment_softmax(rng):
    n_dst = 8
    dst, src = random_coo(rng, 10, n_dst, 40)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    logits_tbl = rng.normal(size=csr.idx.shape).astype(np.float32)
    a_tbl = np.asarray(csr_softmax(jnp.asarray(logits_tbl), csr))
    # flatten to COO and compare with segment softmax
    mask = np.asarray(csr.mask)
    rows = np.repeat(np.arange(n_dst), csr.idx.shape[1]).reshape(mask.shape)
    seg = rows[mask]
    coo_logits = logits_tbl[mask]
    a_coo = np.asarray(
        segment_softmax(jnp.asarray(coo_logits), jnp.asarray(seg), n_dst)
    )
    np.testing.assert_allclose(a_tbl[mask], a_coo, rtol=1e-5, atol=1e-6)


def test_csr_max_empty_rows_get_minus_one(rng):
    n_dst = 6
    dst = np.array([0, 0, 2, 2, 2])
    src = np.array([3, 1, 0, 4, 2])
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    vals = jnp.asarray(
        np.array(
            [[0.5, 0.9, 0], [0, 0, 0], [0.1, 0.8, 0.3], [0, 0, 0], [0, 0, 0], [0, 0, 0]],
            dtype=np.float32,
        )
    )
    mx, arg = csr_max(vals, csr)
    arg = np.asarray(arg)
    mx = np.asarray(mx)
    assert arg[1] == -1 and arg[3] == -1  # empty rows unassigned
    assert arg[0] == 1  # src of the 0.9 slot
    assert arg[2] == 4
    np.testing.assert_allclose(mx[0], 0.9)


def test_transpose_csr_roundtrip(rng):
    """Every valid forward slot appears exactly once in the transpose."""
    n_src, n_dst = 25, 18
    dst, src = random_coo(rng, n_src, n_dst, 120)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    csr_t = transpose_csr(csr, n_src=n_src)
    # collect (src, flat_pos) pairs from transpose
    idx_t, mask_t = np.asarray(csr_t.idx), np.asarray(csr_t.mask)
    pairs = set()
    for s in range(n_src):
        for t in range(idx_t.shape[1]):
            if mask_t[s, t]:
                pairs.add((s, int(idx_t[s, t])))
    # expected: for each valid forward slot (d, k) with src s
    idx_f, mask_f = np.asarray(csr.idx), np.asarray(csr.mask)
    want = set()
    k = idx_f.shape[1]
    for d in range(n_dst):
        for kk in range(k):
            if mask_f[d, kk]:
                want.add((int(idx_f[d, kk]), d * k + kk))
    assert pairs == want


def test_csr_gather_t_grad_matches_plain_gather(rng):
    """The transpose-table (scatter-free) backward is numerically
    identical to XLA's scatter-add transpose of the gather."""
    n_src, n_dst, f = 30, 22, 8
    dst, src = random_coo(rng, n_src, n_dst, 150)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    csr_t = transpose_csr(csr, n_src=n_src)
    x = jnp.asarray(rng.normal(size=(n_src, f)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(*csr.idx.shape, f)).astype(np.float32)
    )

    def loss_plain(x):
        g = csr_gather(x, csr)
        return jnp.where(csr.mask[..., None], g * w, 0).sum()

    def loss_t(x):
        g = csr_gather_t(x, csr, csr_t)
        return jnp.where(csr.mask[..., None], g * w, 0).sum()

    np.testing.assert_allclose(
        np.asarray(loss_plain(x)), np.asarray(loss_t(x)), rtol=1e-5
    )
    g1 = np.asarray(jax.grad(loss_plain)(x))
    g2 = np.asarray(jax.grad(loss_t)(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_grad_flows_through_spmm(rng):
    n_src, n_dst, f = 10, 7, 4
    dst, src = random_coo(rng, n_src, n_dst, 30)
    csr = coo_to_padded_csr(dst, src, n_dst=n_dst)
    x = jnp.asarray(rng.normal(size=(n_src, f)).astype(np.float32))

    def loss(x):
        return csr_spmm(x, csr).sum()

    g = np.asarray(jax.grad(loss)(x))
    # gradient of sum over neighbor-sums = in-degree contribution per src
    deg = np.zeros(n_src)
    for s in src:
        deg[s] += 1
    np.testing.assert_allclose(g[:, 0], deg, rtol=1e-5)


def test_row_gather_1d_matches_plain_indexing():
    """row_gather_1d (lane-wide lookup for 1-D tables — the r4 fix for
    TPU's devectorized 1-D gathers) must equal plain indexing for any
    table length / position pattern, including non-128-multiple tables
    and repeated positions."""
    import jax.numpy as jnp

    from segger_tpu.ops import row_gather_1d

    rng = np.random.default_rng(3)
    for m in (1, 127, 128, 129, 1000):
        table = rng.integers(-5, 10_000, m).astype(np.int32)
        pos = rng.integers(0, m, 257).astype(np.int32)
        got = np.asarray(row_gather_1d(jnp.asarray(table),
                                       jnp.asarray(pos)))
        np.testing.assert_array_equal(got, table[pos])


def test_score_candidates_fast_paths_match_reference(rng):
    """The normalized (unit-vector) fast path and the bf16 dtype path
    must agree with the plain f32 renormalizing path: assignments
    identical away from near-ties, similarities close."""
    from segger_tpu.ops import score_candidates

    n_tx, n_bd, f = 600, 50, 32
    etx = rng.normal(size=(n_tx, f)).astype(np.float32)
    ebd = rng.normal(size=(n_bd, f)).astype(np.float32)
    # unit vectors, as the encoder's normalize_embeddings emits
    etx /= np.linalg.norm(etx, axis=1, keepdims=True)
    ebd /= np.linalg.norm(ebd, axis=1, keepdims=True)
    ca_s = np.repeat(np.arange(n_tx), 3)
    ca_d = rng.integers(0, n_bd, ca_s.size)
    cand = coo_to_padded_csr(ca_s, ca_d, n_dst=n_tx, k=4)
    bd_index = np.arange(n_bd, dtype=np.int32) + 7

    args = (jnp.asarray(etx), jnp.asarray(ebd),
            jax.tree.map(jnp.asarray, cand), jnp.asarray(bd_index))
    sim0, seg0 = score_candidates(*args)
    sim1, seg1 = score_candidates(*args, normalized=True)
    np.testing.assert_allclose(np.asarray(sim1), np.asarray(sim0),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg0))

    sim2, seg2 = score_candidates(*args, dtype=jnp.bfloat16,
                                  normalized=True)
    assert np.asarray(sim2).dtype == np.float32  # thresholds need f32
    np.testing.assert_allclose(np.asarray(sim2), np.asarray(sim0),
                               atol=2e-2)
    agree = (np.asarray(seg2) == np.asarray(seg0)).mean()
    assert agree > 0.97, agree


def test_score_candidates_pallas_backend_matches_xla(rng, monkeypatch):
    """The fused Pallas scoring kernel (interpret mode on CPU) must
    reproduce the XLA chain exactly: similarities allclose, assignments
    identical, and the empty-row (-1e30, -1) contract preserved."""
    from segger_tpu.ops import score_candidates

    n_tx, n_bd, f = 700, 60, 64
    etx = rng.normal(size=(n_tx, f)).astype(np.float32)
    ebd = rng.normal(size=(n_bd, f)).astype(np.float32)
    etx /= np.linalg.norm(etx, axis=1, keepdims=True)
    ebd /= np.linalg.norm(ebd, axis=1, keepdims=True)
    # leave a block of transcripts with NO candidates (empty rows)
    ca_s = np.repeat(np.arange(n_tx - 100), 3)
    ca_d = rng.integers(0, n_bd, ca_s.size)
    cand = coo_to_padded_csr(ca_s, ca_d, n_dst=n_tx, k=4)
    bd_index = np.arange(n_bd, dtype=np.int32) + 3

    args = (jnp.asarray(etx), jnp.asarray(ebd),
            jax.tree.map(jnp.asarray, cand), jnp.asarray(bd_index))
    monkeypatch.setenv("SEGGER_SCORE", "xla")
    sim0, seg0 = score_candidates(*args, normalized=True)
    monkeypatch.setenv("SEGGER_SCORE", "pallas")
    sim1, seg1 = score_candidates(*args, normalized=True)

    np.testing.assert_allclose(np.asarray(sim1), np.asarray(sim0),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(seg1), np.asarray(seg0))
    # empty rows: unassigned contract
    empty = ~np.asarray(cand.mask).any(axis=1)
    assert empty.sum() == 100
    assert (np.asarray(seg1)[empty] == -1).all()
    assert (np.asarray(sim1)[empty] <= -1e29).all()
