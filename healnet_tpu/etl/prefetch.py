"""Host->HBM input pipeline: threaded batch production + device prefetch.

Replaces the reference's fork-based DataLoader workers and Manager-dict cache
(`/root/reference/healnet/main.py:214-240`, `loaders.py:127-128`) with the
TPU-appropriate design (SURVEY.md §2.6): a background producer thread keeps a
bounded queue of host batches while :class:`DevicePrefetcher` keeps ``depth``
batches already transferred to HBM, so the H2D copy of batch N+1 overlaps the
compute of batch N (double buffering at depth=2).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


_SENTINEL = object()


class BackgroundIterator:
    """Runs an iterator in a daemon thread with a bounded buffer."""

    def __init__(self, iterable, buffer_size: int = 4):
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._error: Optional[BaseException] = None
        self._exhausted = False
        self._stop = threading.Event()

        def worker():
            try:
                for item in iterable:
                    # bounded put that notices close(): an abandoned
                    # consumer (failed step, KeyboardInterrupt) must not
                    # leave this thread pinned forever holding WSI-sized
                    # batches
                    while not self._stop.is_set():
                        try:
                            self._queue.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as exc:  # propagate into the consumer
                self._error = exc
            finally:
                # the sentinel MUST be delivered on normal exhaustion (a
                # full queue would drop it with put_nowait and hang the
                # consumer's next get()); the stop flag still bounds it
                while not self._stop.is_set():
                    try:
                        self._queue.put(_SENTINEL, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def close(self) -> None:
        """Release the producer thread and buffered items."""
        self._stop.set()
        self._exhausted = True
        while True:
            try:
                self._queue.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=2.0)

    def __iter__(self):
        return self

    def __next__(self):
        # the sentinel arrives exactly once; remember exhaustion so further
        # next() calls don't block on an empty queue forever
        if self._exhausted:
            raise StopIteration
        item = self._queue.get()
        if item is _SENTINEL:
            self._exhausted = True
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


class DevicePrefetcher:
    """Keep ``depth`` batches resident on device ahead of the consumer."""

    def __init__(
        self,
        batches: Iterator[Any],
        depth: int = 2,
        put_fn: Optional[Callable[[Any], Any]] = None,
        buffer_size: int = 4,
    ):
        """
        Args:
            batches: host-batch iterator (e.g. ``TCGADataset.iter_batches``).
            depth: number of batches to keep on device (2 = double buffering).
            put_fn: host->device placement (default ``jax.device_put`` of the
                whole pytree; pass ``parallel.put_batch`` partial for meshes).
        """
        self._src = BackgroundIterator(batches, buffer_size=buffer_size)
        self._depth = depth
        self._put = put_fn or (lambda b: jax.tree_util.tree_map(jax.device_put, b))
        self._ready: list = []

    def __iter__(self):
        self._fill()
        while self._ready:
            item = self._ready.pop(0)
            self._fill()
            yield item

    def _fill(self) -> None:
        while len(self._ready) < self._depth:
            try:
                host_batch = next(self._src)
            except StopIteration:
                return
            self._ready.append(self._put(host_batch))

    def close(self) -> None:
        """Release the background producer and buffered batches (safe to
        call after normal exhaustion; REQUIRED after abandoning the
        iterator mid-epoch, or the producer thread stays pinned)."""
        self._src.close()
        self._ready.clear()
