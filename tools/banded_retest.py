"""Retest the Mosaic ``tpu.dynamic_gather`` crash that blocks the
banded edge-stage kernel (ops/pallas/banded.py) on each toolchain
upgrade.

Step 1 compiles the minimal repro — a bare ``take_along_axis`` kernel
at (256, 128) (works at (8, 128), crashed at >=256 rows on the blocked
toolchain).  If it passes, step 2 runs the full banded kernel against
the XLA reference on a realistic strip-major banded graph and prints a
timing comparison vs the production post-gather path.

    timeout 900 python tools/banded_retest.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0]}, jax {jax.__version__}")

    # ---- step 1: minimal dynamic_gather repro --------------------------
    R, C = 256, 128

    def gather_kernel(w_ref, i_ref, o_ref):
        idx = jax.lax.broadcast_in_dim(i_ref[:].reshape(R), (R, C), (0,))
        o_ref[:] = jnp.take_along_axis(w_ref[:], idx, axis=0)

    w = jnp.asarray(np.random.default_rng(0).normal(size=(R, C)),
                    jnp.float32)
    i = jnp.asarray(np.random.default_rng(1).integers(0, R, (R, 1)),
                    jnp.int32)
    try:
        out = pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w, i)
        ref = np.asarray(w)[np.asarray(i).ravel()]
        np.testing.assert_allclose(np.asarray(out), ref)
        print(f"step 1 OK: ({R}, {C}) dynamic gather compiles and is "
              "correct — the Mosaic bug is FIXED on this toolchain")
    except Exception as e:  # noqa: BLE001
        print(f"step 1 STILL BLOCKED: {type(e).__name__}: "
              f"{str(e)[:300]}")
        return

    # ---- step 2: full banded kernel vs XLA reference -------------------
    from segger_tpu.ops.pallas.banded import (
        band_graph, banded_edge_stage, BLOCK, WINDOW,
    )
    from segger_tpu.ops import coo_to_padded_csr
    from segger_tpu.data.neighbors_host import kdtree_neighbors
    from segger_tpu.data.partition import _strip_major_order

    rng = np.random.default_rng(0)
    n = 50_000
    pos = rng.uniform(0, 600, (n, 2)).astype(np.float32)
    order = _strip_major_order(pos)
    pos = pos[order]
    src, dst = kdtree_neighbors(pos, max_k=5, max_dist=5.0)
    csr = coo_to_padded_csr(dst, src, n_dst=n, pad_to_multiple=8)
    lo, idx_local, mask, ok = band_graph(csr, n_src=n)
    print(f"band_graph ok={ok} (zero spill expected at Xenium density)")
    if not ok:
        return

    hc, heads = 128, 2
    xl = jnp.asarray(rng.normal(size=(max(n, WINDOW), hc)), jnp.float32)
    n_pad = idx_local.shape[0]
    xr = jnp.asarray(rng.normal(size=(n_pad, hc)), jnp.float32)
    att = jnp.asarray(rng.normal(size=(heads, hc // heads)), jnp.float32)
    bias = jnp.zeros((hc,), jnp.float32)

    out = banded_edge_stage(
        xl, xr, jnp.asarray(lo), jnp.asarray(idx_local),
        jnp.asarray(mask), att, bias, heads=heads,
    )
    out.block_until_ready()

    # XLA reference
    g = jnp.take(xl, jnp.asarray(idx_local)
                 + jnp.asarray(lo).repeat(BLOCK)[:, None], axis=0)
    p = g + xr[:, None, :]
    s = jnp.where(p > 0, p, 0.2 * p)
    sh = s.reshape(n_pad, -1, heads, hc // heads)
    logits = (sh * att[None, None]).sum(-1)
    m = jnp.asarray(mask)[..., None]
    z = jnp.where(m, logits, -1e30)
    z = z - z.max(axis=1, keepdims=True)
    ez = jnp.where(m, jnp.exp(z), 0.0)
    alpha = ez / jnp.maximum(ez.sum(axis=1, keepdims=True), 1e-30)
    ref = (alpha[..., None] * sh_g(g, heads, hc)).sum(axis=1).reshape(
        n_pad, hc) + bias
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
    print("step 2 OK: banded kernel matches the XLA reference on TPU")


def sh_g(g, heads, hc):
    return g.reshape(g.shape[0], g.shape[1], heads, hc // heads)


if __name__ == "__main__":
    main()
