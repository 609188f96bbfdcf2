"""Continuous-batching search server.

The reference serves queries from a CLI loop; the production TPU pattern
(BASELINE.md: "continuous query batching, merged top-k") is a server that
coalesces concurrently-arriving queries into fixed-shape device batches:

* requests are queued and packed into a static ``max_batch`` batch (padded —
  a single compiled program serves every batch size);
* batch i+1 is dispatched before batch i's results are fetched, so the
  host↔device transfer latency overlaps the next batch's compute
  (double-buffering; SURVEY §5's "overlap the collective with the next
  batch's scan" applied at the host boundary);
* results are delivered per-request via futures.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Tuple

import numpy as np


class SearchServer:
    """Continuous-batching wrapper around ``VAQIndex.search_device``."""

    def __init__(self, index, k: int, max_batch: int = 256,
                 max_wait_ms: float = 2.0, backend: str = "decoded",
                 recall_target: float = 0.99):
        import jax.numpy as jnp

        self._jnp = jnp
        self.index = index
        self.k = k
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.backend = backend
        self.recall_target = recall_target
        self._queue: "queue.Queue" = queue.Queue()
        self._carry = None     # request that overflowed the previous batch
        self._running = True
        self._pending: Optional[Tuple[list, object, object, np.ndarray, float]] = None
        self.batches_served = 0
        self.queries_served = 0
        from vaq_tpu.profiling import LatencyStats

        self.stats = LatencyStats()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, query: np.ndarray) -> Future:
        """Enqueue one query (d,) or a small group (g, d); returns a Future
        resolving to (distances, labels) numpy arrays."""
        fut: Future = Future()
        q = np.atleast_2d(np.asarray(query, dtype=np.float32))
        if q.shape[0] > self.max_batch:
            fut.set_exception(ValueError(
                f"group of {q.shape[0]} queries exceeds max_batch="
                f"{self.max_batch}; split the request"))
            return fut
        self._queue.put((q, fut))
        return fut

    def search(self, query: np.ndarray, timeout: float = 60.0):
        return self.submit(query).result(timeout)

    def close(self) -> None:
        self._running = False
        self._queue.put(None)
        self._thread.join(timeout=10.0)
        self._flush_pending()

    # ------------------------------------------------------------------
    def _collect_batch(self) -> Optional[List[Tuple[np.ndarray, Future]]]:
        if self._carry is not None:
            first = self._carry
            self._carry = None
        else:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                return []
            if first is None:
                return None
        items = [first]
        rows = first[0].shape[0]
        deadline = time.perf_counter() + self.max_wait_s
        while rows < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                self._queue.put(None)  # re-signal shutdown
                break
            if rows + nxt[0].shape[0] > self.max_batch:
                self._carry = nxt      # doesn't fit — next batch leads with it
                break
            items.append(nxt)
            rows += nxt[0].shape[0]
        return items

    def _dispatch(self, items: List[Tuple[np.ndarray, Future]]):
        jnp = self._jnp
        qs = np.concatenate([q for q, _ in items], axis=0)
        nrows = qs.shape[0]
        if nrows < self.max_batch:
            qs = np.pad(qs, ((0, self.max_batch - nrows), (0, 0)))
        else:
            qs = qs[: self.max_batch]
        t0 = time.perf_counter()
        d, i = self.index.search_device(
            jnp.asarray(qs), self.k, backend=self.backend,
            recall_target=self.recall_target)
        return (items, d, i, nrows, t0)

    def _flush_pending(self) -> None:
        if self._pending is None:
            return
        items, d, i, nrows, t0 = self._pending
        self._pending = None
        d_np, i_np = np.asarray(d), np.asarray(i)
        self.stats.record(time.perf_counter() - t0, nrows)
        row = 0
        for q, fut in items:
            g = q.shape[0]
            fut.set_result((d_np[row: row + g], i_np[row: row + g]))
            row += g
        self.batches_served += 1
        self.queries_served += row

    def _loop(self) -> None:
        while self._running:
            items = self._collect_batch()
            if items is None:
                break
            if not items:
                self._flush_pending()  # drain while idle
                continue
            try:
                dispatched = self._dispatch(items)  # async dispatch (device)
                self._flush_pending()               # fetch previous batch
                self._pending = dispatched
            except Exception as e:                  # fail the batch, not the server
                self._pending = None
                for _, fut in items:
                    if not fut.done():
                        fut.set_exception(e)
        self._flush_pending()
