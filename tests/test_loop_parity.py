"""Whole-loop behavioral parity: the JAX training loop vs the vendored
float64 torch reference loop on the same synthetic slide with MATCHED
sampling (VERDICT r2 item 4).

Both loops start from the identical flax init, run S full-batch steps of
the reference's three-loss objective (margin triplet on tx, cluster-
similarity metric MSE on bd, modular-shift-negative link loss —
/root/reference/src/segger/models/lightning_model.py:151-213) under the
cosine loss-weight schedule and Adam(1e-3), and must produce:

  - loss curves that track each other step by step, and
  - >= 99% identical final above-threshold transcript assignments.

Sampling is matched by construction: triplet positives/negatives and the
link-loss modular shifts are parameter-independent draws, so the torch
loop consumes the exact indices the JAX samplers produce for each step's
keys (replayed host-side).  The torch loop then uses the REFERENCE's own
numerics: torch TripletMarginLoss semantics (PairwiseDistance adds
eps=1e-6 to the difference), F.cosine_similarity, autograd through the
vendored PyG forward (tests/pyg_vendor.py), and the optax-Adam update
formula in float64.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import torch

from segger_tpu.data.graph import TileGraph
from segger_tpu.data.synthetic import make_synthetic
from segger_tpu.models import ISTEncoder
from segger_tpu.models import losses as L
from segger_tpu.ops import coo_to_padded_csr, transpose_csr
from segger_tpu.pipeline import ISTPipeline, PipelineConfig

from tests import pyg_vendor as V

S = 24           # steps (full-batch epochs)
LR = 1e-3
TX_MARGIN, SG_MARGIN = 0.3, 0.4
HEADS, HIDDEN, OUT, N_MID = 2, 16, 16, 1


@pytest.fixture(scope="module")
def setup():
    s = make_synthetic(n_cells=70, n_genes=24, mean_tx_per_cell=14, seed=7)
    cfg = PipelineConfig(
        cells_embedding_size=8,
        genes_min_counts=5,
        cells_min_counts=3,
        prediction_graph_mode="uniform",
        prediction_graph_max_k=4,
    )
    graph = ISTPipeline(s.transcripts, s.boundaries, s.polygons, cfg) \
        .load().graph

    n_tx, n_bd = graph.n_tx, graph.n_bd
    tt = coo_to_padded_csr(graph.tt_dst, graph.tt_src, n_dst=n_tx)
    tb = coo_to_padded_csr(graph.sg_dst, graph.sg_src, n_dst=n_bd)
    tile = TileGraph(
        tx_gene=graph.tx_gene,
        tx_pos=graph.tx_pos.astype(np.float32),
        tx_cluster=graph.tx_cluster,
        tx_index=graph.tx_index.astype(np.int32),
        tx_valid=np.ones(n_tx, bool),
        tx_interior=np.ones(n_tx, bool),
        bd_x=graph.bd_x,
        bd_pos=graph.bd_pos.astype(np.float32),
        bd_cluster=graph.bd_cluster,
        bd_index=graph.bd_index.astype(np.int32),
        bd_valid=np.ones(n_bd, bool),
        bd_interior=np.ones(n_bd, bool),
        tt=tt,
        tb=tb,
        cand=coo_to_padded_csr(graph.cand_src, graph.cand_dst,
                               n_dst=n_tx),
        sg_src=graph.sg_src.astype(np.int32),
        sg_dst=graph.sg_dst.astype(np.int32),
        sg_mask=np.ones(graph.sg_src.size, bool),
        tt_t=transpose_csr(tt, n_src=n_tx),
        tb_t=transpose_csr(tb, n_src=n_tx),
    )
    tile = jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tile
    )
    model = ISTEncoder(
        n_genes=graph.n_genes,
        in_channels=graph.gene_embedding.shape[1],
        hidden_channels=HIDDEN, out_channels=OUT,
        n_mid_layers=N_MID, n_heads=HEADS,
    )
    params = model.init(jax.random.PRNGKey(0), tile)
    return graph, tile, model, params


def _step_keys(i):
    k = jax.random.fold_in(jax.random.PRNGKey(42), i)
    return jax.random.split(k, 3)  # k_tx, k_bd, k_sg


def _weights(i):
    # a genuinely varying schedule so the parity covers the ramp
    return L.cosine_weight_schedule(
        i, S, w_start=(1.0, 1.0, 0.2), w_end=(0.2, 0.2, 1.0)
    )


# ----------------------------------------------------------------------
# JAX loop
# ----------------------------------------------------------------------
def run_jax_loop(tile, model, params, sg_loss_type="triplet"):
    tx_sim = jnp.asarray(np.eye(int(np.asarray(tile.tx_cluster).max()) + 1,
                                 dtype=np.float32) * 2 - 1)
    bd_sim = jnp.asarray(np.eye(int(np.asarray(tile.bd_cluster).max()) + 1,
                                 dtype=np.float32) * 2 - 1)
    opt = optax.adam(LR)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o, keys, weights):
        def loss_fn(p):
            emb = model.apply(p, tile, deterministic=True)
            stats = L.loss_stats(
                keys[0], keys[1], keys[2], emb, tile, tx_sim, bd_sim,
                tx_margin=TX_MARGIN, sg_margin=SG_MARGIN,
                sg_loss_type=sg_loss_type, use_interior=False,
            )
            return (
                weights[0] * stats[0] / jnp.maximum(stats[1], 1.0)
                + weights[1] * stats[2] / jnp.maximum(stats[3], 1.0)
                + weights[2] * stats[4] / jnp.maximum(stats[5], 1.0)
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    losses = []
    for i in range(S):
        params, opt_state, loss = step(
            params, opt_state, _step_keys(i), jnp.asarray(_weights(i))
        )
        losses.append(float(loss))
    emb = model.apply(params, tile, deterministic=True)
    return np.asarray(losses), jax.tree.map(np.asarray, emb)


# ----------------------------------------------------------------------
# torch reference loop (vendored PyG semantics, float64, reference
# numerics, matched sampling)
# ----------------------------------------------------------------------
def _torch_params(params):
    def conv(tree):
        return {k: _torch_params({"params": v})["params"]
                if isinstance(v, dict) else v for k, v in tree.items()}

    def leafify(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = leafify(v)
            else:
                t = torch.tensor(np.asarray(v), dtype=torch.float64)
                t.requires_grad_(True)
                out[k] = t
        return out

    return leafify(params["params"])


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def _pairwise_dist(a, b):
    # torch PairwiseDistance semantics: eps added to the DIFFERENCE
    # (the reference's TripletMarginLoss path)
    return ((a - b + 1e-6) ** 2).sum(-1).sqrt()


def run_torch_loop(graph, tile, model, params, sg_loss_type="triplet"):
    tp = _torch_params(params)
    leaves = list(_leaves(tp))
    m = [torch.zeros_like(x) for x in leaves]
    v = [torch.zeros_like(x) for x in leaves]
    b1, b2, eps = 0.9, 0.999, 1e-8

    tt_src = np.asarray(graph.tt_src)
    tt_dst = np.asarray(graph.tt_dst)
    tb_src = np.asarray(graph.sg_src)
    tb_dst = np.asarray(graph.sg_dst)

    tx_lab = np.asarray(tile.tx_cluster)
    bd_lab = np.asarray(tile.bd_cluster)
    tx_valid = np.asarray(tile.tx_valid) & (tx_lab >= 0)
    bd_valid = np.asarray(tile.bd_valid) & (bd_lab >= 0)
    tx_sim = np.eye(tx_lab.max() + 1, dtype=np.float32) * 2 - 1
    bd_sim = np.eye(bd_lab.max() + 1, dtype=np.float32) * 2 - 1
    n_bd = int(np.asarray(tile.bd_valid).sum())
    sg_src = np.asarray(tile.sg_src)
    sg_dst = np.asarray(tile.sg_dst)

    def fwd():
        _, out = V.pyg_ist_encoder_forward(
            np.asarray(tile.tx_gene), np.asarray(tile.bd_x),
            np.asarray(tile.tx_pos), np.asarray(tile.bd_pos),
            tt_src, tt_dst, tb_src, tb_dst,
            tp, HEADS, HIDDEN, OUT, N_MID,
        )
        return out

    losses = []
    for i in range(S):
        k_tx, k_bd, k_sg = _step_keys(i)
        w = _weights(i)

        # matched sampling: replay the JAX samplers for this step's keys
        s_tx = jax.tree.map(np.asarray, L.sample_triplets(
            k_tx, jnp.asarray(tx_lab), jnp.asarray(tx_valid),
            jnp.asarray(tx_sim)))
        s_bd = jax.tree.map(np.asarray, L.sample_triplets(
            k_bd, jnp.asarray(bd_lab), jnp.asarray(bd_valid),
            jnp.asarray(bd_sim)))
        shift = np.asarray(jax.random.randint(
            k_sg, (sg_src.size,), 1, max(n_bd, 2)))
        dst_neg = (sg_dst + shift) % max(n_bd, 2)

        out = fwd()
        etx, ebd = out["tx"], out["bd"]

        # tx margin triplet over sampled ok anchors
        ok = torch.tensor(tx_valid & s_tx.ok)
        dp = _pairwise_dist(etx, etx[torch.tensor(s_tx.positives,
                                                  dtype=torch.long)])
        dn = _pairwise_dist(etx, etx[torch.tensor(s_tx.negatives,
                                                  dtype=torch.long)])
        l_tx = torch.clamp(dp - dn + TX_MARGIN, min=0.0)[ok].mean()

        # bd metric MSE of cosine sims vs cluster-similarity targets
        okb = torch.tensor(bd_valid & s_bd.ok)
        cp = torch.nn.functional.cosine_similarity(
            ebd, ebd[torch.tensor(s_bd.positives, dtype=torch.long)], -1)
        cn = torch.nn.functional.cosine_similarity(
            ebd, ebd[torch.tensor(s_bd.negatives, dtype=torch.long)], -1)
        tgt_p = torch.tensor(1.0 - s_bd.dists_pos, dtype=torch.float64)
        tgt_n = torch.tensor(1.0 - s_bd.dists_neg, dtype=torch.float64)
        l_bd = (((cp - tgt_p) ** 2)[okb].mean()
                + ((cn - tgt_n) ** 2)[okb].mean())

        # link loss over supervision edges, modular-shift negatives:
        # margin triplet or BCE on dot-product logits (the reference's
        # two segmentation_loss modes, lightning_model.py:188-207)
        a = etx[torch.tensor(sg_src, dtype=torch.long)]
        pos = ebd[torch.tensor(sg_dst, dtype=torch.long)]
        neg = ebd[torch.tensor(dst_neg, dtype=torch.long)]
        if sg_loss_type == "bce":
            logit_p = (a * pos).sum(-1)
            logit_n = (a * neg).sum(-1)
            l_sg = torch.nn.functional.binary_cross_entropy_with_logits(
                torch.cat([logit_p, logit_n]),
                torch.cat([torch.ones_like(logit_p),
                           torch.zeros_like(logit_n)]),
            )
        else:
            l_sg = torch.clamp(
                _pairwise_dist(a, pos) - _pairwise_dist(a, neg)
                + SG_MARGIN,
                min=0.0,
            ).mean()

        loss = (float(w[0]) * l_tx + float(w[1]) * l_bd
                + float(w[2]) * l_sg)
        losses.append(float(loss))

        for x in leaves:
            x.grad = None
        loss.backward()

        # optax-Adam update formula, float64
        t_ = i + 1
        with torch.no_grad():
            for j, x in enumerate(leaves):
                g = x.grad if x.grad is not None else torch.zeros_like(x)
                m[j] = b1 * m[j] + (1 - b1) * g
                v[j] = b2 * v[j] + (1 - b2) * g * g
                mh = m[j] / (1 - b1 ** t_)
                vh = v[j] / (1 - b2 ** t_)
                x -= LR * mh / (vh.sqrt() + eps)

    with torch.no_grad():
        out = fwd()
    return np.asarray(losses), {
        "tx": out["tx"].numpy(), "bd": out["bd"].numpy()
    }


def _assignments(emb, tile):
    """Candidate cosine scoring + per-tx argmax (host-side, both loops
    share this decode)."""
    cand_idx = np.asarray(tile.cand.idx)
    cand_mask = np.asarray(tile.cand.mask)
    tx, bd = emb["tx"], emb["bd"]
    g = bd[cand_idx]                                   # (N, K, F)
    num = (tx[:, None, :] * g).sum(-1)
    den = (np.linalg.norm(tx, axis=-1)[:, None]
           * np.linalg.norm(g, axis=-1) + 1e-16)
    sim = np.where(cand_mask, num / den, -np.inf)
    best = sim.argmax(1)
    best_sim = sim[np.arange(sim.shape[0]), best]
    seg = np.asarray(tile.bd_index)[
        cand_idx[np.arange(sim.shape[0]), best]
    ]
    return seg, best_sim


@pytest.mark.parametrize("sg_loss_type", ["triplet", "bce"])
def test_whole_loop_parity(setup, sg_loss_type):
    graph, tile, model, params = setup
    jl, jemb = run_jax_loop(tile, model, params, sg_loss_type)
    tl, temb = run_torch_loop(graph, tile, model, params, sg_loss_type)

    # loss curves track step by step (f32 JAX vs f64 torch)
    np.testing.assert_allclose(jl, tl, rtol=5e-3, atol=5e-4)

    # final above-threshold transcript assignments >= 99% identical.
    # BCE trains dot-product logits, so after S steps cosine
    # similarities sit lower than the triplet run's — compare over the
    # most-confident half instead of a fixed 0.5
    seg_j, sim_j = _assignments(jemb, tile)
    seg_t, sim_t = _assignments(temb, tile)
    thr = 0.5 if sg_loss_type == "triplet" else float(np.median(sim_j))
    above = (sim_j > thr) | (sim_t > thr)
    assert above.sum() > 100  # the comparison is not vacuous
    agree = (seg_j[above] == seg_t[above]).mean()
    assert agree >= 0.99, f"assignment agreement {agree:.4f}"

    # and the embeddings themselves stay close after S optimizer steps
    np.testing.assert_allclose(
        jemb["tx"], temb["tx"], rtol=5e-2, atol=5e-3
    )
