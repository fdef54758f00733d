"""Loss tests: sampler distribution + loss math vs numpy/torch references."""
import numpy as np
import jax
import jax.numpy as jnp

from segger_tpu.models.losses import (
    sample_triplets,
    triplet_loss,
    metric_loss,
    segmentation_loss,
    cosine_weight_schedule,
)


def test_sampler_positives_negatives_valid(rng):
    n, c = 200, 4
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=n) < 0.9)
    sim = jnp.asarray(
        np.array(
            [
                [1.0, 0.8, -0.5, -0.9],
                [0.8, 1.0, -0.2, -0.7],
                [-0.5, -0.2, 1.0, 0.1],
                [-0.9, -0.7, 0.1, 1.0],
            ],
            dtype=np.float32,
        )
    )
    s = sample_triplets(jax.random.PRNGKey(0), labels, valid, sim)
    pos = np.asarray(s.positives)
    neg = np.asarray(s.negatives)
    ok = np.asarray(s.ok)
    v = np.asarray(valid)
    # all sampled members are valid nodes
    assert v[pos[ok]].all()
    assert v[neg[ok]].all()
    assert ok.sum() > 0


def test_sampler_cluster_distribution_follows_cdf(rng):
    """Positives for anchors of cluster 0 should come overwhelmingly from
    similar clusters (0, 1), negatives from dissimilar ones (2, 3)."""
    n, c = 4000, 4
    labels = jnp.asarray(np.zeros(n, dtype=np.int32))
    # ensure every cluster is present
    labels = labels.at[:40].set(jnp.asarray(np.repeat([0, 1, 2, 3], 10)))
    valid = jnp.ones(n, bool)
    sim = jnp.asarray(
        np.array(
            [
                [1.0, 0.9, -0.8, -0.8],
                [0.9, 1.0, -0.5, -0.5],
                [-0.8, -0.5, 1.0, 0.2],
                [-0.8, -0.5, 0.2, 1.0],
            ],
            dtype=np.float32,
        )
    )
    s = sample_triplets(jax.random.PRNGKey(1), labels, valid, sim)
    lab = np.asarray(labels)
    anchors0 = lab == 0
    pos_cl = lab[np.asarray(s.positives)][anchors0]
    neg_cl = lab[np.asarray(s.negatives)][anchors0]
    # positive mass on clusters {0,1}: weights 1.0 + 0.9 vs eps for others
    assert (np.isin(pos_cl, [0, 1])).mean() > 0.99
    # negative mass on clusters {2,3}: weights 0.8 + 0.8 vs eps
    assert (np.isin(neg_cl, [2, 3])).mean() > 0.99


def test_triplet_loss_matches_torch(rng):
    import torch

    n, f, c = 50, 16, 3
    emb = rng.normal(size=(n, f)).astype(np.float32)
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.ones(n, bool)
    sim = jnp.asarray(rng.uniform(-1, 1, (c, c)).astype(np.float32))
    key = jax.random.PRNGKey(3)
    s = sample_triplets(key, labels, valid, sim)
    total, cnt = triplet_loss(key, jnp.asarray(emb), labels, valid, sim, margin=0.3)
    got = float(total) / float(cnt)

    a = torch.tensor(emb)
    p = torch.tensor(emb[np.asarray(s.positives)])
    ng = torch.tensor(emb[np.asarray(s.negatives)])
    want = torch.nn.TripletMarginLoss(margin=0.3)(a, p, ng).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_metric_loss_matches_numpy(rng):
    n, f, c = 40, 8, 3
    emb = rng.normal(size=(n, f)).astype(np.float32)
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.ones(n, bool)
    sim = jnp.asarray(rng.uniform(-1, 1, (c, c)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    s = sample_triplets(key, labels, valid, sim)
    total, cnt = metric_loss(key, jnp.asarray(emb), labels, valid, sim)
    got = float(total) / float(cnt)

    def cos(u, v):
        return (u * v).sum(-1) / (
            np.linalg.norm(u, axis=-1) * np.linalg.norm(v, axis=-1)
        )

    p = emb[np.asarray(s.positives)]
    ng = emb[np.asarray(s.negatives)]
    want = np.mean((cos(emb, p) - (1 - np.asarray(s.dists_pos))) ** 2) + np.mean(
        (cos(emb, ng) - (1 - np.asarray(s.dists_neg))) ** 2
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_segmentation_loss_bce_matches_torch(rng):
    import torch

    n_tx, n_bd, f, e = 30, 8, 16, 20
    emb_tx = rng.normal(size=(n_tx, f)).astype(np.float32)
    emb_bd = rng.normal(size=(n_bd, f)).astype(np.float32)
    src = rng.integers(0, n_tx, e).astype(np.int32)
    dst = rng.integers(0, n_bd, e).astype(np.int32)
    mask = np.ones(e, bool)
    key = jax.random.PRNGKey(11)
    total, cnt = segmentation_loss(
        key, jnp.asarray(emb_tx), jnp.asarray(emb_bd),
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask),
        jnp.asarray(n_bd), loss_type="bce",
    )
    got = float(total) / float(cnt)

    # reproduce the same negatives
    shift = np.asarray(jax.random.randint(key, (e,), 1, n_bd))
    dst_neg = (dst + shift) % n_bd
    logits = np.concatenate(
        [
            (emb_tx[src] * emb_bd[dst]).sum(-1),
            (emb_tx[src] * emb_bd[dst_neg]).sum(-1),
        ]
    )
    labels = np.concatenate([np.ones(e), np.zeros(e)]).astype(np.float32)
    want = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(logits), torch.tensor(labels)
    ).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_segmentation_loss_few_boundaries_is_zero(rng):
    """num_bd <= 1 contributes zero loss (lightning_model.py:173-175)."""
    emb_tx = jnp.asarray(rng.normal(size=(5, 4)).astype(np.float32))
    emb_bd = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
    src = jnp.asarray(np.zeros(4, np.int32))
    dst = jnp.asarray(np.zeros(4, np.int32))
    mask = jnp.ones(4, bool)
    total, cnt = segmentation_loss(
        jax.random.PRNGKey(0), emb_tx, emb_bd, src, dst, mask,
        jnp.asarray(1), loss_type="triplet",
    )
    assert float(cnt) == 0
    assert float(total) == 0


def test_cosine_weight_schedule_matches_reference():
    """Check ramp endpoints and normalization (lightning_model.py:136-149)."""
    w_start = np.array([1.0, 1.0, 0.0])
    w_end = np.array([1.0, 1.0, 0.5])
    w0 = cosine_weight_schedule(0, 20, w_start, w_end)
    wT = cosine_weight_schedule(19, 20, w_start, w_end)
    np.testing.assert_allclose(w0, w_start / w_start.sum(), rtol=1e-5)
    np.testing.assert_allclose(wT, w_end / w_end.sum(), rtol=1e-5)
    # midpoint: alpha=0.5 exactly at t=0.5
    wm = cosine_weight_schedule(9, 19, w_start, w_end, normalize=False)
    np.testing.assert_allclose(wm, (w_start + w_end) / 2, rtol=1e-5)


def test_precomputed_sort_structure_matches_dynamic(rng):
    """Host-precomputed sampler structure reproduces the on-device
    argsort path sample-for-sample."""
    n, c = 120, 4
    labels = rng.integers(0, c, n).astype(np.int32)
    valid = rng.uniform(size=n) < 0.7
    sim = jnp.asarray(rng.uniform(-1, 1, (c, c)).astype(np.float32))
    key = jax.random.PRNGKey(5)

    s_dyn = sample_triplets(
        key, jnp.asarray(labels), jnp.asarray(valid), sim
    )

    # host structure (mirrors data/partition.py::_sampler_structure)
    lab = np.where(valid, labels, c)
    sorted_idx = np.argsort(lab, kind="stable").astype(np.int32)
    counts = np.bincount(lab[valid], minlength=c)[:c].astype(np.int32)
    s_pre = sample_triplets(
        key, jnp.asarray(labels), jnp.asarray(valid), sim,
        sort_structure=(jnp.asarray(sorted_idx), jnp.asarray(counts)),
    )
    np.testing.assert_array_equal(
        np.asarray(s_dyn.positives), np.asarray(s_pre.positives)
    )
    np.testing.assert_array_equal(
        np.asarray(s_dyn.negatives), np.asarray(s_pre.negatives)
    )
    np.testing.assert_array_equal(
        np.asarray(s_dyn.ok), np.asarray(s_pre.ok)
    )


def test_losses_jit_and_grad(rng):
    n, f, c = 32, 8, 3
    emb = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, c, n).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=n) < 0.8)
    sim = jnp.asarray(rng.uniform(-1, 1, (c, c)).astype(np.float32))

    @jax.jit
    def f(emb, key):
        s, cnt = triplet_loss(key, emb, labels, valid, sim)
        return s / jnp.maximum(cnt, 1)

    g = jax.grad(f)(emb, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(g)).all()
