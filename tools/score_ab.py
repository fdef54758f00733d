"""Same-session A/B: the bench predict chain (forward + candidate
scoring) with SEGGER_SCORE=xla vs pallas, interleaved ABAB so session
drift cancels (docs/design.md S6 measurement caveat).

Outcome (2026-08-20, v5e): wash - xla 7.58/7.61, pallas 7.71/7.62 ms.
The standalone scoring win (~0.1 ms, tools/predict_decompose.py) is
returned by the pallas_call materialization boundary; XLA fuses the
all-XLA chain into the final layer's epilogue.  See
ops/pallas/score.py STATUS.

    timeout 590 python tools/score_ab.py
"""
import os, sys, json
sys.path.insert(0, ".")
from bench import build_tile, _chained_ms, _round_trip_floor_ms

def main():
    import jax, jax.numpy as jnp
    from segger_tpu.models import ISTEncoder
    from segger_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    tile = build_tile()  # xlo predict tile, bench default
    model = ISTEncoder(n_genes=400, in_channels=16, hidden_channels=64,
                       out_channels=64, n_mid_layers=2, n_heads=2,
                       dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), tile)
    N = 30
    floor = _round_trip_floor_ms(N)

    def make_chain():
        from segger_tpu.ops import score_candidates
        @jax.jit
        def chain(p):
            def body(i, carry):
                p, acc = carry
                emb = model.apply(p, tile)
                ms, seg = score_candidates(
                    emb["tx"], emb["bd"], tile.cand, tile.bd_index,
                    dtype=jnp.bfloat16, normalized=True)
                acc2 = acc + ms.sum() + seg.sum() * 1e-9
                return (jax.tree.map(lambda x: x + acc2 * 1e-25, p), acc2)
            return jax.lax.fori_loop(0, N, body, (params, 0.0))[1]
        return chain

    chains = {}
    for b in ("xla", "pallas"):
        os.environ["SEGGER_SCORE"] = b
        chains[b] = make_chain()
    res = {"floor_ms": round(floor, 4)}
    for rep in range(2):
        for b in ("xla", "pallas"):
            os.environ["SEGGER_SCORE"] = b
            t = _chained_ms(lambda: chains[b](params), N) - floor
            res[f"pred_{b}_{rep}"] = round(t, 4)
            print(f"pred_{b}_{rep}", res[f"pred_{b}_{rep}"], flush=True)
    print(json.dumps(res))

if __name__ == "__main__":
    main()
