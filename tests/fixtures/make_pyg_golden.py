"""Generate the PyG-semantics golden fixture (tests/fixtures/pyg_golden.npz).

Runs the vendored float64 torch_geometric semantics (tests/pyg_vendor.py,
line-cited to the PyG sources and the reference's ist_encoder.py) over a
small graph engineered to exercise the parity-sensitive corners:

  - tx destinations with ZERO in-edges (isolated-dst softmax: output must
    be exactly the conv bias),
  - a tx destination with exactly ONE in-edge (softmax == 1 regardless of
    logit value),
  - bd destinations with zero in-edges,
  - duplicate (src, dst) pairs kept (multi-edges are legal in PyG and the
    reference never dedupes),
  - non-uniform in-degrees so the padded-CSR masks are load-bearing.

The fixture stores the graph, the flax parameter tree (flattened with
'/'-joined keys), the per-layer golden activations, and the final
embeddings.  tests/test_pyg_golden.py loads it and asserts per-layer
allclose against the JAX encoder — the BASELINE activation-parity target.

Regenerate with:  python tests/fixtures/make_pyg_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_TX, N_BD, N_GENES, F_BD = 40, 7, 11, 5
HEADS, IN_CH, HIDDEN, OUT_CH, N_MID = 3, 8, 8, 8, 1
ISOLATED_TX = (3, 17, 39)   # no tt in-edges
DEGREE1_TX = 11             # exactly one tt in-edge
ISOLATED_BD = (5,)          # no tb in-edges


def build_graph(rng):
    tt_src, tt_dst = [], []
    for d in range(N_TX):
        if d in ISOLATED_TX:
            continue
        k = 1 if d == DEGREE1_TX else int(rng.integers(2, 7))
        srcs = rng.integers(0, N_TX, k)
        tt_src.extend(srcs)
        tt_dst.extend([d] * k)
    # a deliberate duplicate multi-edge
    tt_src.append(tt_src[0])
    tt_dst.append(tt_dst[0])
    tt_src = np.asarray(tt_src, np.int32)
    tt_dst = np.asarray(tt_dst, np.int32)

    tb_src, tb_dst = [], []
    for s in range(N_TX):
        if rng.uniform() < 0.6:
            d = int(rng.integers(0, N_BD))
            while d in ISOLATED_BD:
                d = int(rng.integers(0, N_BD))
            tb_src.append(s)
            tb_dst.append(d)
    tb_src = np.asarray(tb_src, np.int32)
    tb_dst = np.asarray(tb_dst, np.int32)

    return {
        "tx_gene": rng.integers(0, N_GENES, N_TX).astype(np.int32),
        "tx_pos": rng.uniform(0, 100, (N_TX, 2)).astype(np.float32),
        "bd_x": rng.normal(size=(N_BD, F_BD)).astype(np.float32),
        "bd_pos": rng.uniform(0, 100, (N_BD, 2)).astype(np.float32),
        "tt_src": tt_src, "tt_dst": tt_dst,
        "tb_src": tb_src, "tb_dst": tb_dst,
    }


def make_tile(g):
    import jax
    import jax.numpy as jnp
    from segger_tpu.ops import coo_to_padded_csr, transpose_csr
    from segger_tpu.data.graph import TileGraph

    tt = coo_to_padded_csr(g["tt_dst"], g["tt_src"], n_dst=N_TX)
    tb = coo_to_padded_csr(g["tb_dst"], g["tb_src"], n_dst=N_BD)
    tile = TileGraph(
        tx_gene=g["tx_gene"],
        tx_pos=g["tx_pos"],
        tx_cluster=np.zeros(N_TX, np.int32),
        tx_index=np.arange(N_TX, dtype=np.int32),
        tx_valid=np.ones(N_TX, bool),
        tx_interior=np.ones(N_TX, bool),
        bd_x=g["bd_x"],
        bd_pos=g["bd_pos"],
        bd_cluster=np.zeros(N_BD, np.int32),
        bd_index=np.arange(N_BD, dtype=np.int32),
        bd_valid=np.ones(N_BD, bool),
        bd_interior=np.ones(N_BD, bool),
        tt=tt,
        tb=tb,
        cand=None,
        sg_src=np.zeros(1, np.int32),
        sg_dst=np.zeros(1, np.int32),
        sg_mask=np.zeros(1, bool),
        tt_t=transpose_csr(tt, n_src=N_TX),
        tb_t=transpose_csr(tb, n_src=N_TX),
    )
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tile
    )


def flatten_params(tree, prefix=""):
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            flat.update(flatten_params(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from segger_tpu.models import ISTEncoder
    import pyg_vendor as pv

    rng = np.random.default_rng(7)
    g = build_graph(rng)
    tile = make_tile(g)

    model = ISTEncoder(
        n_genes=N_GENES, in_channels=IN_CH, hidden_channels=HIDDEN,
        out_channels=OUT_CH, n_mid_layers=N_MID, n_heads=HEADS,
    )
    params = model.init(jax.random.PRNGKey(5), tile)
    p = jax.tree.map(np.asarray, params["params"])

    acts, out = pv.pyg_ist_encoder_forward(
        g["tx_gene"], g["bd_x"], g["tx_pos"], g["bd_pos"],
        g["tt_src"], g["tt_dst"], g["tb_src"], g["tb_dst"],
        p, HEADS, HIDDEN, OUT_CH, N_MID,
    )

    # sanity: the JAX encoder must already match before we freeze golden
    got, state = model.apply(params, tile, mutable=["intermediates"])
    inter = state["intermediates"]
    for name, want in acts.items():
        have = np.asarray(inter[name][0])
        np.testing.assert_allclose(
            have, want.numpy(), rtol=2e-4, atol=1e-5,
            err_msg=f"generator sanity: {name}",
        )
    np.testing.assert_allclose(
        np.asarray(got["tx"]), out["tx"].numpy(), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["bd"]), out["bd"].numpy(), rtol=2e-4, atol=1e-5
    )

    payload = {f"graph/{k}": v for k, v in g.items()}
    payload.update(
        {f"params/{k}": v for k, v in flatten_params(p).items()}
    )
    payload.update(
        {f"acts/{k}": v.numpy() for k, v in acts.items()}
    )
    payload["out/tx"] = out["tx"].numpy()
    payload["out/bd"] = out["bd"].numpy()
    payload["meta/dims"] = np.asarray(
        [N_TX, N_BD, N_GENES, F_BD, HEADS, IN_CH, HIDDEN, OUT_CH, N_MID]
    )
    path = os.path.join(os.path.dirname(__file__), "pyg_golden.npz")
    np.savez_compressed(path, **payload)
    print(f"wrote {path}: {len(payload)} arrays")


if __name__ == "__main__":
    main()
