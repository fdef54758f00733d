"""Banded-gather WORKAROUND ladder (VERDICT r4 item 6).

The banded in-VMEM edge stage (segger_tpu/ops/pallas/banded.py) is the
only design that breaks the ~580M rows/s XLA gather row-rate bound —
and it is blocked: Mosaic's ``tpu.dynamic_gather`` (the only dynamic
gather it lowers, emitted for in-kernel ``take_along_axis``) crashes
the compile helper for operands >= 256 rows on this toolchain (8-row
operands compile; ``tools/banded_retest.py`` re-checks on every bump).

This ladder measures gather WORKAROUNDS that avoid tpu.dynamic_gather
entirely, against the XLA-gather baseline the production path pays:

  xla_gather    jnp.take of the same rows in XLA (the production cost:
                materializes (W, HC) in HBM) — the bar to beat
  onehot_mxu    in-VMEM gather as one-hot matmuls on the MXU:
                g = onehot(idx, W) @ window, in 512-row chunks.
                FLOPs = slots * W * HC * 2 per block — trades the
                row-rate bound for MXU throughput
  dma_rowcopy   per-slot single-row async copies HBM->VMEM (round-robin
                over 8 DMA semaphores) — the descriptor-latency-bound
                answer, measured rather than assumed

NEGATIVE RESULT, verified in interpret mode before measuring: a
log2(W)-stage pltpu.roll + per-destination-bit select "butterfly"
network does NOT implement gather.  The per-destination select
x'[j] = bit_s(u_j) ? x[j+2^s] : x[j] is only correct when the shift
residue carried by the *fetched* cell equals the destination's — false
for general (and duplicate-containing) index vectors; routing them
needs a Beneš network with host-computed switch states plus multicast
for duplicates, at which point the host work rivals building the
one-hot operands.  The ladder therefore measures the two workarounds
that are actually semantics-correct.

Both kernels DMA the source window HBM->VMEM per 256-row destination
block exactly like the blocked banded kernel, so their numbers are the
honest "what would the banded design cost TODAY without
tpu.dynamic_gather" answer.  Validated vs NumPy in interpret mode
(--check); timed with the chained-dispatch harness on the real chip.

MEASURED 2026-08-20 (v5e, jax 0.9.0, 50k-row problem, band 1200):

    xla_gather    1.42 ms   563-579M rows/s  (the production bound)
    dma_rowcopy   46.6 ms   17.2M rows/s     (33x WORSE — descriptor-
                                              latency bound, measured
                                              not assumed)
    onehot_mxu    BLOCKED — the same Mosaic tpu_compile_helper crash
                  (HTTP 500) as the banded kernel's dynamic_gather, at
                  both (512, 4096) and small-piece (512, 512) one-hot
                  operand shapes; interpret-validated only.

Conclusion: on this toolchain there is NO viable workaround below the
XLA gather's row rate; the banded design stays blocked on Mosaic fixes
(tools/banded_retest.py re-checks each toolchain bump).

    python tools/banded_workarounds.py --check      # CPU, correctness
    timeout 1500 python tools/banded_workarounds.py  # TPU, timing
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import numpy as np

sys.path.insert(0, ".")

BLOCK = 256
K_BAND = 16
WINDOW = BLOCK * K_BAND  # 4096


def build_banded_problem(seed=0, n_tx=50_000, hc=128, band=1200):
    """Strip-major-like banded index table: every destination block's
    source rows fall inside a WINDOW-row window (band << WINDOW, the
    measured Xenium-density band is ~1.2k rows)."""
    rng = np.random.default_rng(seed)
    n_pad = -(-n_tx // BLOCK) * BLOCK
    idx = np.zeros((n_pad, K_BAND), np.int32)
    mask = np.zeros((n_pad, K_BAND), bool)
    deg = rng.integers(3, 6, n_pad)
    for_rows = np.arange(n_pad)
    # neighbors within +-band/2 of the row (banded locality)
    off = rng.integers(-band // 2, band // 2, (n_pad, K_BAND))
    idx_full = np.clip(for_rows[:, None] + off, 0, n_tx - 1)
    slot = np.arange(K_BAND)[None, :]
    mask = slot < deg[:, None]
    idx = np.where(mask, idx_full, 0).astype(np.int32)

    n_blocks = n_pad // BLOCK
    lo = np.zeros(n_blocks, np.int32)
    max_lo = max(n_tx - WINDOW, 0)
    for b in range(n_blocks):
        blk = idx[b * BLOCK:(b + 1) * BLOCK]
        m = mask[b * BLOCK:(b + 1) * BLOCK]
        smin = int(blk[m].min()) if m.any() else 0
        lo[b] = min(max(smin, 0), max_lo)
        smax = int(blk[m].max()) if m.any() else 0
        assert smax - lo[b] < WINDOW, "band exceeded the window"
    local = np.clip(
        idx - lo.repeat(BLOCK)[:, None], 0, WINDOW - 1
    ).astype(np.int32)
    # roll-network shifts: out slot j (flattened per block) sits at
    # window row j; it needs window row local[j], i.e. an upward
    # cyclic shift of u_j = (local[j] - j) mod WINDOW
    flat_local = local.reshape(n_blocks, WINDOW)
    j = np.arange(WINDOW, dtype=np.int32)[None, :]
    u = ((flat_local - j) % WINDOW).astype(np.int32)
    return dict(n_tx=n_tx, n_pad=n_pad, hc=hc, lo=lo, local=local,
                mask=mask, u=u)


# ----------------------------------------------------------------------
def make_kernels(prob, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hc = prob["hc"]
    n_pad = prob["n_pad"]
    n_blocks = n_pad // BLOCK
    CHUNK = 512  # one-hot rows per matmul

    def _onehot_kernel(lo_ref, idxl_ref, xl_hbm, out_ref, win, sem):
        b = pl.program_id(0)
        copy = pltpu.make_async_copy(
            xl_hbm.at[pl.ds(lo_ref[b], WINDOW), :], win, sem
        )
        copy.start()
        copy.wait()
        w = win[:].astype(jnp.bfloat16)               # (W, HC)
        flat = idxl_ref[:].reshape(WINDOW)
        # small operand pieces (Mosaic's compile helper crashes on the
        # single (CHUNK, W) one-hot): accumulate over W in PIECE-column
        # one-hot matmuls; all slices static (c/p are Python ints)
        PIECE = 512
        col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, PIECE), 1)
        for c in range(WINDOW // CHUNK):
            ids = flat[c * CHUNK:(c + 1) * CHUNK]
            g = jnp.zeros((CHUNK, w.shape[1]), jnp.float32)
            for p in range(WINDOW // PIECE):
                oh = (col + (p * PIECE) == ids[:, None]).astype(
                    jnp.bfloat16
                )
                g = g + jnp.dot(
                    oh, w[p * PIECE:(p + 1) * PIECE],
                    preferred_element_type=jnp.float32,
                )
            out_ref[c * CHUNK:(c + 1) * CHUNK, :] = g.astype(
                out_ref.dtype
            )

    def onehot_gather(xl, lo, local):
        return pl.pallas_call(
            _onehot_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_blocks,),
                in_specs=[
                    pl.BlockSpec((BLOCK, K_BAND), lambda b, lo_ref: (b, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.ANY),
                ],
                out_specs=pl.BlockSpec(
                    (WINDOW, hc), lambda b, lo_ref: (b, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((WINDOW, hc), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=jax.ShapeDtypeStruct(
                (n_blocks * WINDOW, hc), jnp.float32
            ),
            interpret=interpret,
        )(lo, local, xl)

    N_INFLIGHT = 8

    def _dma_kernel(gidx_ref, xl_hbm, out_ref, sems):
        # gidx_ref: (W, 1) int32 GLOBAL source rows for this block's
        # slots.  One single-row copy per slot, N_INFLIGHT outstanding
        # round-robin over the semaphore array; all copies are the same
        # (1, HC) size, so any same-shape descriptor can wait a slot.
        def issue(j, _):
            row = gidx_ref[j, 0]
            pltpu.make_async_copy(
                xl_hbm.at[pl.ds(row, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % N_INFLIGHT],
            ).start()

            @pl.when(j >= N_INFLIGHT - 1)
            def _():
                # wait copy j-(N_INFLIGHT-1): its slot is the one the
                # NEXT iteration will reuse
                jj = j - (N_INFLIGHT - 1)
                pltpu.make_async_copy(
                    xl_hbm.at[pl.ds(0, 1), :],
                    out_ref.at[pl.ds(jj, 1), :],
                    sems.at[jj % N_INFLIGHT],
                ).wait()
            return 0

        jax.lax.fori_loop(0, WINDOW, issue, 0)

        def drain(t, _):
            j = WINDOW - (N_INFLIGHT - 1) + t
            pltpu.make_async_copy(
                xl_hbm.at[pl.ds(0, 1), :],
                out_ref.at[pl.ds(j, 1), :],
                sems.at[j % N_INFLIGHT],
            ).wait()
            return 0

        jax.lax.fori_loop(0, N_INFLIGHT - 1, drain, 0)

    def dma_rowcopy(xl, gidx_col):
        return pl.pallas_call(
            _dma_kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((WINDOW, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (WINDOW, hc), lambda b: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((N_INFLIGHT,)),
            ],
            out_shape=jax.ShapeDtypeStruct(
                (n_blocks * WINDOW, hc), jnp.float32
            ),
            interpret=interpret,
        )(gidx_col, xl)

    def xla_gather(xl, global_idx_flat):
        g = jnp.take(xl, global_idx_flat, axis=0, mode="clip")
        return jax.lax.optimization_barrier(g)

    return onehot_gather, dma_rowcopy, xla_gather


def expected(prob, xl):
    """NumPy reference: per block, window rows at the local indices."""
    n_blocks = prob["n_pad"] // BLOCK
    outs = []
    for b in range(n_blocks):
        w = xl[prob["lo"][b]: prob["lo"][b] + WINDOW]
        outs.append(w[prob["local"].reshape(n_blocks, WINDOW)[b]])
    return np.concatenate(outs, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="interpret-mode correctness on small shapes")
    ap.add_argument("--n-tx", type=int, default=50_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        prob = build_banded_problem(n_tx=WINDOW * 2, band=600)
    else:
        prob = build_banded_problem(n_tx=args.n_tx)

    from segger_tpu.utils import enable_compilation_cache

    if not args.check:
        enable_compilation_cache()

    rng = np.random.default_rng(0)
    xl = rng.normal(size=(prob["n_tx"], prob["hc"])).astype(np.float32)
    onehot_gather, dma_rowcopy, xla_gather = make_kernels(
        prob, interpret=args.check
    )
    lo = jnp.asarray(prob["lo"])
    local = jnp.asarray(prob["local"])
    xl_d = jnp.asarray(xl)
    gidx_np = (
        prob["local"].reshape(-1) + prob["lo"].repeat(WINDOW)
    ).astype(np.int32)
    gidx = jnp.asarray(gidx_np)
    gidx_col = jnp.asarray(gidx_np.reshape(-1, 1))

    if args.check:
        want = expected(prob, xl)
        got_oh = np.asarray(onehot_gather(xl_d, lo, local))
        # the one-hot path rounds the window to bf16 before the matmul
        np.testing.assert_allclose(
            got_oh, want.astype(np.float32), rtol=1e-2, atol=2e-2
        )
        print("onehot_mxu: OK (interpret, bf16 tolerance)")
        got_dma = np.asarray(dma_rowcopy(xl_d, gidx_col))
        np.testing.assert_allclose(got_dma, want, atol=0)
        print("dma_rowcopy: OK (interpret)")
        return

    from bench import _chained_ms, _round_trip_floor_ms

    N = 30
    floor = _round_trip_floor_ms(N)
    res = {"floor_ms": round(floor, 4), "n_pad": prob["n_pad"],
           "window": WINDOW, "block": BLOCK,
           "rows_gathered": prob["n_pad"] * K_BAND,
           "slots": prob["n_pad"] * K_BAND}

    def chain(stage, *xs):
        @jax.jit
        def f(*xs):
            def body(i, carry):
                x0, acc = carry
                out = stage(x0, *xs[1:])
                acc2 = acc + out[0, 0].astype(jnp.float32)
                return (x0 + (acc2 * 1e-30).astype(x0.dtype), acc2)
            return jax.lax.fori_loop(
                0, N, body, (xs[0], jnp.float32(0.0))
            )[1]
        return lambda: f(*xs)

    cases = {
        "xla_gather": (xla_gather, xl_d, gidx),
        "onehot_mxu": (onehot_gather, xl_d, lo, local),
        "dma_rowcopy": (dma_rowcopy, xl_d, gidx_col),
    }
    for name, (stage, *xs) in cases.items():
        try:
            ms = _chained_ms(chain(stage, *xs), N) - floor
            res[name + "_ms"] = round(ms, 4)
            res[name + "_rows_per_s"] = round(
                prob["n_pad"] * K_BAND / (ms / 1e3), 0
            ) if ms > 0 else None
        except Exception as ex:  # noqa: BLE001
            res[name + "_ms"] = (
                f"FAIL {type(ex).__name__}: {str(ex)[:160]}"
            )
        print(name, res[name + "_ms"], flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
