"""Host-side batch loading + device prefetch.

The reference uses torch ``DataLoader`` worker processes
(reference: train.py:301-327). On TPU the equivalent concern is keeping the
single-threaded jit dispatch loop fed: a background thread reads and converts
the packed files while the device crunches the current step, and ``jax.
device_put`` runs one batch ahead (double buffering into HBM).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Sequence

import jax
import numpy as np

_HOST_KEYS_SKIP = ("pair_path",)


def split_host_device(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if k not in _HOST_KEYS_SKIP}


class BatchLoader:
    """Iterates a dataset in a background thread.

    Yields (index, batch) in the given order. ``num_workers`` mirrors the
    reference flag but a single reader thread is usually enough: file sizes
    are ~1-4 MB and conversion is memcpy-bound.
    """

    def __init__(self, dataset, order: Sequence[int], queue_size: int = 4):
        self.dataset = dataset
        self.order = list(order)
        self.queue_size = queue_size

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self.queue_size)
        stop = threading.Event()

        def worker():
            try:
                for i in self.order:
                    if stop.is_set():
                        return
                    q.put((i, self.dataset[i]))
            except Exception as e:  # surface loader errors on the main thread
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class DevicePrefetcher:
    """Wraps an iterator of numpy batches with one-step-ahead device_put."""

    def __init__(self, it: Iterator, device: Optional[jax.Device] = None):
        self.it = iter(it)
        self.device = device

    def _put(self, item):
        idx, batch = item
        host = {k: v for k, v in batch.items() if k in _HOST_KEYS_SKIP}
        dev = {
            k: jax.device_put(np.asarray(v), self.device)
            for k, v in batch.items()
            if k not in _HOST_KEYS_SKIP
        }
        return idx, dev, host

    def __iter__(self):
        pending = None
        for item in self.it:
            ready = pending
            pending = self._put(item)
            if ready is not None:
                yield ready
        if pending is not None:
            yield pending
