"""Host-side batch prefetching: overlap tile extraction with device
compute.

The reference overlaps data preparation with training via 8 DataLoader
worker processes (reference: src/segger/data/data_module.py:137,346-366).
segger-tpu's tile extraction is NumPy slicing + padding; a small thread
pool producing into a bounded queue gives the same overlap without
process-spawn overhead, and ``device_put`` happens on the consumer side
so the producer never touches JAX state.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


class PrefetchIterator:
    """Iterate ``fn(item)`` over ``items`` with ``depth`` results built
    ahead on a background thread.

    Single-use: a second ``iter()`` raises (the stream is consumed —
    silently resuming mid-stream or deadlocking on a drained queue are
    both worse).  The producer watches a stop flag with bounded-timeout
    puts, so abandoning iteration early (exception in the consumer
    loop, KeyboardInterrupt) releases the thread and its pending
    batches via ``close()`` — also called by ``__del__`` and usable as
    a context manager.
    """

    def __init__(
        self,
        items: Iterable,
        fn: Callable,
        depth: int = 2,
    ):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._items = list(items)
        self._fn = fn
        self._err: Optional[BaseException] = None
        self._stop = threading.Event()
        self._consumed = False
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for it in self._items:
                if self._stop.is_set():
                    return
                out = self._fn(it)
                while not self._stop.is_set():
                    try:
                        self._q.put(out, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                else:
                    return
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            while not self._stop.is_set():
                try:
                    self._q.put(_SENTINEL, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def close(self):
        """Release the producer thread and any pending batches."""
        self._stop.set()
        # drain so a put-blocked producer can observe the stop flag
        while True:
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):  # pragma: no cover - GC timing dependent
        try:
            self._stop.set()
        except Exception:
            pass

    def __iter__(self) -> Iterator:
        if self._consumed:
            raise RuntimeError(
                "PrefetchIterator is single-use and already consumed; "
                "build a new one (trainer.iter_batches) to re-iterate."
            )
        self._consumed = True
        try:
            while True:
                out = self._q.get()
                if out is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield out
        finally:
            self.close()

    def __len__(self):
        return len(self._items)
