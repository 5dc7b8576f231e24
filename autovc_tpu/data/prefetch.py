"""Device prefetching: overlap host-side batch sampling + H2D transfer with
the device step (the TPU-idiomatic replacement for torch DataLoader workers).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import jax

_END = object()  # end-of-stream sentinel


class DevicePrefetcher:
    """Wraps a host batch iterator; a background thread device_puts `depth`
    batches ahead with the given sharding(s).

    Exceptions from the wrapped iterator are forwarded to the consumer (one
    per occurrence) and the worker keeps pulling, so a consumer that retries
    `next()` keeps getting fresh batches. Iterator exhaustion raises
    StopIteration at the consumer.
    """

    def __init__(self, it: Iterator, sharding, depth: int = 2):
        self._it = iter(it)
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = next(self._it)
            except StopIteration:
                self._put(_END)
                return
            except Exception as exc:  # forward and keep serving
                if not self._put(exc):
                    return
                continue
            from autovc_tpu.parallel.mesh import put_global_batch

            try:
                put = jax.tree_util.tree_map(
                    lambda x: put_global_batch(x, self._sharding), tuple(batch)
                )
            except Exception as exc:  # device_put can fail too (e.g. during
                if not self._put(exc):  # runtime teardown) — forward, don't
                    return  # kill the thread with an unhandled exception
                continue
            if not self._put(put):
                return

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _END:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        """Stop and JOIN the worker. The join matters in multi-process runs:
        a worker mid-`jax.device_put` while the main thread tears down
        jax.distributed crashes into the half-finalized runtime, and its
        process then aborts the peers' in-flight collectives."""
        self._stop.set()
        # drain so a worker blocked on a full queue can see the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=60.0)
        if self._thread.is_alive():
            # A worker stuck inside next(self._it) (stalled host iterator)
            # survived the join — make the leak visible: in multihost
            # teardown a live worker re-opens exactly the
            # mid-device_put-during-shutdown crash this join prevents.
            import warnings

            warnings.warn(
                "DevicePrefetcher worker still alive after 60s join — the "
                "wrapped host iterator is blocked; runtime teardown may race "
                "an in-flight device_put",
                RuntimeWarning,
                stacklevel=2,
            )
