"""Device prefetching: overlap host-side batch sampling + H2D transfer with
the device step (the TPU-idiomatic replacement for torch DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax


class DevicePrefetcher:
    """Wraps a host batch iterator; a background thread device_puts `depth`
    batches ahead with the given sharding(s)."""

    def __init__(self, it: Iterator, sharding, depth: int = 2):
        self._it = it
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                if self._stop.is_set():
                    return
                put = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, self._sharding), tuple(batch)
                )
                while not self._stop.is_set():
                    try:
                        self._q.put(put, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except Exception as exc:  # surface worker errors to the consumer
            self._q.put(exc)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
