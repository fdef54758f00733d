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
    ahead on a background thread."""

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
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for it in self._items:
                self._q.put(self._fn(it))
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._q.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            out = self._q.get()
            if out is _SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield out

    def __len__(self):
        return len(self._items)
