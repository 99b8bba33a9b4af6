"""Double-buffered host→device prefetching.

The reference's decode path is a synchronous whole-clip
``torchvision.io.read_video`` (prepare_dataset/main.py:65 — its memory
wall); SAM3 hides decode latency with an async frame-loader thread + FIFO
lock (sam3/model/io_utils.py:455). Here: a bounded background-thread
prefetcher over any chunk iterator, plus device prefetch that keeps the
next chunk's H2D transfer in flight while the current chunk computes —
the double-buffering recipe of SURVEY.md §7.3.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


class PrefetchIterator:
    """Wrap an iterator with a bounded background producer thread.

    Exceptions in the producer propagate to the consumer; the thread shuts
    down cleanly on early exit (``close``/GC) — the concurrency-safety
    design the reference gets from queue-per-rank + FIFO locks, reduced to
    one producer/consumer pair.
    """

    def __init__(self, iterable: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce,
                                        args=(iter(iterable),), daemon=True)
        self._thread.start()

    def _produce(self, it: Iterator):
        try:
            for item in it:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._q.put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — forward to consumer
            self._q.put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        self._stop.set()

    def __del__(self):  # pragma: no cover - GC path
        self.close()


def device_prefetch(iterable: Iterable, transform: Optional[Callable] = None,
                    depth: int = 2):
    """Yield device arrays one step behind the transfer: the next chunk's
    host→device copy is issued before the current chunk is consumed."""
    import jax

    def to_device(x):
        if transform is not None:
            x = transform(x)
        return jax.device_put(x)

    src = PrefetchIterator(iterable, depth=depth)
    pending = None
    for item in src:
        nxt = to_device(item)
        if pending is not None:
            yield pending
        pending = nxt
    if pending is not None:
        yield pending
