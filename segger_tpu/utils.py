"""Logging setup with live memory annotation.

Analogue of the reference's ``setup_logging`` + ``MemFilter``
(reference: src/segger/utils.py:6-41): every log record carries live
memory usage.  The reference reports the RMM GPU pool; segger-tpu runs
its data plane on host RAM and its compute on TPU HBM, so records carry
host RSS (and TPU memory stats when a device is live and queryable).
"""
from __future__ import annotations

import logging


def free_mem_str() -> str:
    """Short human-readable memory usage string."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    kb = int(line.split()[1])
                    return f"{kb / 1e6:.2f}G RSS"
    except OSError:
        pass
    return "?"


def print_free_mem() -> None:
    print(free_mem_str())


def enable_compilation_cache() -> None:
    """Point JAX at a persistent on-disk compilation cache.

    Whole-slide runs are dominated by XLA compiles through this
    environment's tunneled TPU backend (minutes per program); the
    persistent cache makes repeat shapes free across processes.
    Directory from ``SEGGER_XLA_CACHE`` (set to ``0`` to disable);
    default ``/tmp/segger_tpu_xla_cache``.  Idempotent and safe to call
    before or after backend initialization.
    """
    import os

    d = os.environ.get("SEGGER_XLA_CACHE", "/tmp/segger_tpu_xla_cache")
    if not d or d == "0":
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - old jax without the knobs
        logging.getLogger(__name__).warning(
            "could not enable the persistent compilation cache",
            exc_info=True,
        )


def peak_rss_gb() -> float:
    """Process high-water-mark RSS in GB (VmHWM)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return float("nan")


class MemFilter(logging.Filter):
    """Injects live memory usage into every record
    (reference: utils.py:6-13)."""

    def filter(self, record):
        record.mem = free_mem_str()
        return True


def setup_logging(level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger("segger_tpu")
    logger.setLevel(level.upper())
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.addFilter(MemFilter())
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s [%(mem)s] %(name)s: %(message)s"
            )
        )
        logger.addHandler(handler)
        logger.propagate = False
    return logger
