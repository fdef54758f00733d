"""Axon-tunnel host-memory leak probe (round-5 finding).

The 105M-transcript run phase peaked at 85.8 GB ANONYMOUS host RSS
while the same code measures FLAT anonymous RSS across repeated full
predict passes on the CPU backend (6 passes, 2.47 -> 2.52 GB).  This
probe isolates the cause: on this environment's tunneled TPU backend
(PJRT plugin 'axon'), EVERY host<->device transfer leaks anonymous host
memory proportionally to the bytes moved, regardless of API path, and
neither ``Array.delete()`` nor ``gc.collect()`` reclaims it.

Measured 2026-08-20 (jax 0.9.0, TPU v5 lite0 via axon tunnel),
20 x 13 MB transfers per trial, RssAnon from /proc/self/status:

    jnp.asarray      +242 MB / 260 MB moved   (~0.93 B leaked / B)
    jax.device_put   +244 MB / 260 MB         (~0.94)
    jit(numpy arg)   +244 MB / 260 MB         (~0.94)
    resident array   +0 MB                    (clean)
    np.asarray(dev)  +403 MB / 260 MB moved   (~1.55 B leaked / B,
                                               device->host is WORSE)

Implication: a whole-slide run's host anon peak is
``real residency + ~0.94 x bytes_to_device + ~1.55 x bytes_to_host``.
The trainer therefore counts transfer bytes (SeggerTrainer
.bytes_to_device / .bytes_to_host) so run artifacts can report the
framework's own residency separately from the tunnel's staging leak
(docs/runs/xenium_100m_streaming.json notes).  Nothing in user code can
avoid it — tiles are visited once per phase, so transfers are O(graph)
by design and the leak integrates them.

    timeout 900 python tools/tunnel_leak_probe.py
"""
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from segger_tpu.utils_profiling import AnonRSSSampler

    read = AnonRSSSampler.read_gb
    x_np = np.random.rand(64, 50_000).astype(np.float32)  # 13 MB
    mb = x_np.nbytes / 1e6

    @jax.jit
    def f(x):
        return (x * 1.000001).sum()

    print("backend:", jax.default_backend(),
          "warmup:", float(f(jnp.asarray(x_np))), flush=True)

    def trial(name, fn, n=20):
        a0 = read()
        for _ in range(n):
            fn()
        a1 = read()
        print(
            f"{name}: +{(a1 - a0) * 1024:.0f} MB leaked / "
            f"{n * mb:.0f} MB moved "
            f"({(a1 - a0) * 1024 / (n * mb):.2f} B/B)",
            flush=True,
        )

    trial("jnp.asarray", lambda: float(f(jnp.asarray(x_np))))
    trial("device_put", lambda: float(f(jax.device_put(x_np))))
    trial("jit_numpy_arg", lambda: float(f(x_np)))
    xb = jnp.asarray(x_np)
    trial("resident_no_transfer", lambda: float(f(xb)))

    def del_path():
        x = jnp.asarray(x_np)
        v = float(f(x))
        x.delete()

    trial("asarray_explicit_delete", del_path)
    big = jnp.zeros((64, 50_000), jnp.float32) + 1.5
    trial("device_to_host_fetch", lambda: float(np.asarray(big).sum()))


if __name__ == "__main__":
    main()
