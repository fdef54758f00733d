"""Two-process distribution-layer test.

Spawns two ``jax.distributed`` CPU processes (gloo collectives, 4
virtual devices each) running tests/_multihost_worker.py, which
exercises the multi-process branches that in-process tests cannot:
``initialize_multihost``, ``put_sharded``'s cross-host
``make_array_from_callback`` placement, and ``fetch_global``'s
``process_allgather`` — then asserts the sharded whole-slide prediction
matches the single-device computation exactly.

The reference has no multi-process mode (single GPU, single process —
SURVEY §2.11); this covers segger-tpu's pod-slice claim on CPU.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_sharded_predict():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # the worker pins its own platform/device count; scrub any
    # conflicting outer settings
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            low = out.lower()
            if "gloo" in low and ("unavailable" in low
                                  or "not compiled" in low):
                pytest.skip("gloo CPU collectives unavailable: " + out[-500:])
            pytest.fail(f"worker {pid} rc={p.returncode}:\n{out[-4000:]}")
        assert f"MULTIHOST_OK pid={pid}" in out, out[-4000:]
