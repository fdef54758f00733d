"""Decompose predict_step - forward = candidate scoring cost
(VERDICT r3 item 4: predict_step 8.7 ms vs fwd 6.9 ms; target
predict <= fwd + 0.5 ms).

Times score_candidates and its pieces on FIXED embeddings (chained,
bench methodology), so the conv forward is excluded:

  gather     csr_gather(bd_feats, cand)            (N, K, F) rows
  score      + einsum + norms + divide             cosine per slot
  full       + csr_max + bd_index map              the production op

    timeout 1200 python tools/predict_decompose.py
"""
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_tile, _chained_ms, _round_trip_floor_ms
    from segger_tpu.ops import csr_gather, csr_max, score_candidates
    from segger_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    F32 = jnp.float32
    tile = build_tile()
    n_tx = tile.tx_gene.shape[0]
    n_bd = tile.bd_x.shape[0]
    rng = np.random.default_rng(0)
    emb_tx = jnp.asarray(rng.normal(size=(n_tx, 64)), F32)
    emb_bd = jnp.asarray(rng.normal(size=(n_bd, 64)), F32)
    cand = tile.cand

    def gather_only(etx, ebd):
        g = csr_gather(ebd, cand)
        return g.sum() * 1e-9

    def score_only(etx, ebd):
        g = csr_gather(ebd, cand)
        num = jnp.einsum("nf,nkf->nk", etx, g)
        ntx = jnp.sqrt(jnp.maximum((etx * etx).sum(-1, keepdims=True),
                                   1e-16))
        ng = jnp.sqrt(jnp.maximum((g * g).sum(-1), 1e-16))
        return (num / (ntx * ng)).sum() * 1e-9

    def full(etx, ebd):
        ms, seg = score_candidates(etx, ebd, cand, tile.bd_index)
        return ms.sum() + seg.sum() * 1e-9

    # ---- candidate levers (r5: close the predict <= fwd + 0.5 ms gap)
    from segger_tpu.ops import PaddedCSR, coo_to_padded_csr
    from segger_tpu.ops.padded_csr import padded_csr_to_coo

    # exact-width table: bench pads the K=3 candidate graph to K=4, so
    # 25% of the row-rate-bound gather rows are padding
    ca_d, ca_s = padded_csr_to_coo(
        jax.tree.map(np.asarray, cand)
    )
    cand_k3 = jax.tree.map(
        jnp.asarray, coo_to_padded_csr(ca_d, ca_s, n_dst=n_tx, k=3)
    )
    emb_tx16 = emb_tx.astype(jnp.bfloat16)
    emb_bd16 = emb_bd.astype(jnp.bfloat16)

    def full_k3(etx, ebd):
        ms, seg = score_candidates(etx, ebd, cand_k3, tile.bd_index)
        return ms.sum() + seg.sum() * 1e-9

    def full_bf16(etx, ebd):
        ms, seg = score_candidates(
            etx.astype(jnp.bfloat16), ebd.astype(jnp.bfloat16),
            cand, tile.bd_index,
        )
        return ms.sum() + seg.sum() * 1e-9

    def full_bf16_k3(etx, ebd):
        ms, seg = score_candidates(
            etx.astype(jnp.bfloat16), ebd.astype(jnp.bfloat16),
            cand_k3, tile.bd_index,
        )
        return ms.sum() + seg.sum() * 1e-9

    def full_bf16_norm(etx, ebd):
        # the shipped predict config: bf16 + already-unit embeddings
        ms, seg = score_candidates(
            etx, ebd, cand, tile.bd_index,
            dtype=jnp.bfloat16, normalized=True,
        )
        return ms.sum() + seg.sum() * 1e-9

    def full_norm(etx, ebd):
        # f32 + already-unit embeddings (no dtype casts: the candidate
        # gather is row-rate bound, so halving bytes buys little while
        # the bf16 casts add two full passes over both tables)
        ms, seg = score_candidates(
            etx, ebd, cand, tile.bd_index, normalized=True,
        )
        return ms.sum() + seg.sum() * 1e-9

    import os

    N = 100
    floor = _round_trip_floor_ms(N)
    res = {"floor_ms": round(floor, 4)}
    # (name, fn, SEGGER_SCORE backend) — the env var is read at trace
    # time inside score_candidates, so setting it before each jit works
    for name, fn, backend in [
        ("gather", gather_only, "xla"),
        ("score", score_only, "xla"),
        ("full", full, "xla"),
        ("full_k3", full_k3, "xla"),
        ("full_bf16", full_bf16, "xla"),
        ("full_bf16_k3", full_bf16_k3, "xla"),
        ("full_bf16_norm_xla", full_bf16_norm, "xla"),
        ("full_bf16_norm_pallas", full_bf16_norm, "pallas"),
        ("full_norm_xla", full_norm, "xla"),
        ("full_norm_pallas", full_norm, "pallas"),
    ]:
        os.environ["SEGGER_SCORE"] = backend
        @jax.jit
        def chain(etx, ebd, fn=fn):
            def body(i, carry):
                etx, ebd, acc = carry
                acc2 = acc + fn(etx, ebd)
                return (etx + acc2 * 1e-30, ebd + acc2 * 1e-30, acc2)
            return jax.lax.fori_loop(0, N, body, (etx, ebd, 0.0))[2]
        res[name + "_ms"] = round(
            _chained_ms(lambda: chain(emb_tx, emb_bd), N) - floor, 4
        )
        print(name, res[name + "_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
