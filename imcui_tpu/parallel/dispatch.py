"""Micro-batching request dispatcher — the Ray-Serve analog for TPU.

The reference scales serving with 4 replica processes × 1 GPU behind an
HTTP router (reference: imcui/api/server.py:42-64, imcui/config/api.yaml).
On TPU the equivalent is ONE process and ONE compiled program: concurrent
requests are collected for up to ``max_wait_ms``, padded into a fixed
pair-batch (so the executable is reused), executed as a single device
program whose batch axis shards over the mesh's data axis, and fanned back
out to the waiting callers.
"""

import queue
import threading
import time

from .. import logger


class _Pending:
    __slots__ = ("item", "event", "result", "error")

    def __init__(self, item):
        self.item = item
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Collects concurrent submissions into fixed-size batches.

    run_batch: callable(list_of_items) -> list_of_results, called on a
    dedicated worker thread with 1..batch_size items (the callable pads to
    its compiled batch internally).
    """

    def __init__(self, run_batch, batch_size=4, max_wait_ms=5.0):
        self.run_batch = run_batch
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self._queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, item, timeout=600.0):
        """Blocking submit; returns the per-item result."""
        p = _Pending(item)
        self._queue.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("matching request timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < self.batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                results = self.run_batch([p.item for p in batch])
                for p, r in zip(batch, results):
                    p.result = r
                    p.event.set()
            except Exception as e:  # propagate to every waiter
                logger.exception("micro-batch execution failed")
                for p in batch:
                    p.error = e
                    p.event.set()

    def close(self):
        self._stop.set()
        self._thread.join(timeout=1.0)
