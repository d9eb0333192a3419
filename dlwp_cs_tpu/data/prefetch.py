"""Host->device prefetching: keep the chips fed.

The reference feeds batches synchronously from Keras ``Sequence`` threads with
a host->GPU copy inside every train step (SURVEY.md §3.2 "bottlenecks").
Here a background thread assembles batches and issues ``jax.device_put``
ahead of consumption, so the device copy of batch k+1..k+depth overlaps the
compute of batch k — the single-host analog of the per-host input pipelines
of SURVEY.md §7 M4/M5.
"""

from __future__ import annotations

import queue
import threading

import jax

__all__ = ["prefetch_to_device", "PrefetchIterator"]


class PrefetchIterator:
    """Iterator wrapper with a device-put-ahead background thread."""

    _SENTINEL = object()

    def __init__(self, iterable, *, depth: int = 2, sharding=None):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._sharding = sharding
        self._err: BaseException | None = None
        self._closed = False
        self._thread = threading.Thread(
            target=self._worker, args=(iterable,), daemon=True
        )
        self._thread.start()

    def _put(self, item):
        if self._sharding is not None:
            return jax.device_put(item, self._sharding)
        return jax.device_put(item)

    def _worker(self, iterable):
        try:
            for item in iterable:
                if self._closed:
                    return
                self._queue.put(self._put(item))
        except BaseException as e:  # propagate into consumer
            self._err = e
        finally:
            # The sentinel must reach a live consumer (blocking put), but a
            # CLOSING consumer may have refilled the queue race-wise after
            # draining (depth=1: our just-unblocked put fills the only
            # slot) — a plain blocking put would then hang this thread
            # forever. Poll with a timeout and give up once closed.
            while True:
                try:
                    self._queue.put(self._SENTINEL, timeout=0.1)
                    return
                except queue.Full:
                    if self._closed:
                        return

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            # Re-arm the sentinel: exhausted iterators must raise
            # StopIteration on EVERY subsequent call (Trainer.fit's fused
            # chunk loop calls next() again after a partial tail chunk —
            # a one-shot sentinel deadlocked it on queue.get()).
            self._queue.put(self._SENTINEL)
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Release the worker of an abandoned iterator.

        Without this, a consumer that stops early leaves the daemon thread
        blocked on a full queue, pinning ``depth + 1`` device-resident
        batches for the iterator's lifetime.
        """
        self._closed = True
        # drain until the worker has actually exited: a single drain pass
        # can race with the worker's just-unblocked put refilling the
        # queue (reproducible at depth=1), leaving it blocked forever
        while self._thread.is_alive():
            try:
                self._queue.get_nowait()
            except queue.Empty:
                self._thread.join(timeout=0.05)
        # keep the exhausted-iterator contract for any later __next__
        try:
            self._queue.put_nowait(self._SENTINEL)
        except queue.Full:
            pass

    def __del__(self):  # noqa: D105 - best-effort release
        try:
            self.close()
        except Exception:
            pass


def prefetch_to_device(iterable, *, depth: int = 2, sharding=None):
    """Wrap an iterable of pytrees; yields device-resident copies ``depth`` ahead.

    ``sharding``: optional ``jax.sharding.Sharding`` (e.g. batch-sharded
    NamedSharding) applied to every leaf — this is how multi-device input
    feeding composes with the data-parallel train step.
    """
    return PrefetchIterator(iterable, depth=depth, sharding=sharding)
