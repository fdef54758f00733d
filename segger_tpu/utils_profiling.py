"""Profiling hooks: trace capture + throughput counters.

The reference ships no profiling (SURVEY §5.1 — only a GPU-pool memory
log filter).  segger-tpu provides:

  - :func:`trace`: a context manager around ``jax.profiler`` trace
    capture (open the output in XProf/TensorBoard)
  - :class:`StageTimer`: wall-clock per-stage counters with derived
    rates (edges/s, transcripts/s) that the trainer logs per epoch
  - :func:`device_memory_stats`: live device memory, when the backend
    exposes it
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link: bool = False):
    """Capture a device trace around a code block.

    Example::

        with trace("/tmp/segger-trace"):
            trainer.fit(tiles, max_epochs=1)
    """
    import jax

    jax.profiler.start_trace(
        str(log_dir), create_perfetto_link=create_perfetto_link
    )
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock + work counters per pipeline stage."""

    def __init__(self):
        self.seconds: Dict[str, float] = defaultdict(float)
        self.items: Dict[str, float] = defaultdict(float)
        self.calls: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, items: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.seconds[name] += time.perf_counter() - t0
            self.items[name] += items
            self.calls[name] += 1

    def add(self, name: str, seconds: float, items: float = 0.0):
        self.seconds[name] += seconds
        self.items[name] += items
        self.calls[name] += 1

    def rates(self) -> Dict[str, float]:
        """items/second per stage (0 when no items recorded)."""
        return {
            k: (self.items[k] / s if s > 0 else 0.0)
            for k, s in self.seconds.items()
        }

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "seconds": round(self.seconds[k], 4),
                "calls": self.calls[k],
                "items": self.items[k],
                "rate": round(
                    self.items[k] / self.seconds[k], 2
                ) if self.seconds[k] > 0 else 0.0,
            }
            for k in self.seconds
        }

    def dump(self, path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))


# ----------------------------------------------------------------------
# library-internal sub-stage hook: long host stages (phenograph kNN /
# Jaccard / Louvain, tx-graph kNN, prediction graph) report into a
# process-global StageTimer when one is installed, so whole-slide run
# artifacts can attribute "features+graph" wall-clock per stage without
# threading a timer through every signature.
_SUBSTAGES: Optional[StageTimer] = None


def set_substage_timer(timer: Optional[StageTimer]) -> Optional[StageTimer]:
    """Install (or clear, with None) the global sub-stage timer.
    Returns the previous one so callers can restore it."""
    global _SUBSTAGES
    prev = _SUBSTAGES
    _SUBSTAGES = timer
    return prev


@contextlib.contextmanager
def substage(name: str, items: float = 0.0):
    """Record a library-internal stage into the installed sub-stage
    timer; no-op (zero overhead beyond one global read) when none is."""
    t = _SUBSTAGES
    if t is None:
        yield
    else:
        with t.stage(name, items=items):
            yield


class AnonRSSSampler:
    """Samples RssAnon (anonymous resident memory, /proc/self/status) on
    a daemon thread and keeps the high-water mark.

    ``ru_maxrss`` counts *mapped file pages* too — on a memmapped graph
    plane those are reclaimable page cache, so the anonymous high-water
    is the honest "the process actually needs this much RAM" number.
    Linux keeps no kernel high-water for RssAnon, hence the sampler.
    """

    def __init__(self, interval: float = 0.25):
        import threading

        self.interval = interval
        self.peak_gb = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def read_gb() -> float:
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("RssAnon:"):
                        return int(line.split()[1]) / 1024.0 / 1024.0
        except OSError:
            pass
        return 0.0

    def _run(self):
        while not self._stop.is_set():
            self.peak_gb = max(self.peak_gb, self.read_gb())
            self._stop.wait(self.interval)

    def start(self):
        self.peak_gb = self.read_gb()
        self._thread.start()
        return self

    def stop(self) -> float:
        self._stop.set()
        self._thread.join(timeout=5)
        self.peak_gb = max(self.peak_gb, self.read_gb())
        return self.peak_gb


def device_memory_stats() -> Optional[dict]:
    """Per-device memory stats when the backend exposes them."""
    import jax

    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        return dict(stats) if stats else None
    except Exception:
        return None
