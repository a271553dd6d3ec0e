"""Host->device prefetching dataloader wrapper.

Redesign of the reference's forked MpDeviceLoader
(reference: unidisc/utils/parallel_loader.py — per-device queues with
background transfer threads). JAX version: a background thread stages the
next batches onto the device (with the training mesh's data sharding) while
the current step runs, hiding host->device latency.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class DevicePrefetcher:
    def __init__(self, loader: Iterator, sharding=None, depth: int = 2):
        self.loader = loader
        self.sharding = sharding
        self.depth = depth
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, batch):
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray)}
        rest = {k: v for k, v in batch.items()
                if not isinstance(v, np.ndarray)}
        staged = jax.device_put(arrays, self.sharding) \
            if self.sharding is not None else jax.device_put(arrays)
        staged.update(rest)
        self._q.put(staged)

    def _worker(self):
        try:
            for batch in self.loader:
                if self._stop.is_set():
                    return
                self._put(batch)
        except Exception as e:  # noqa: BLE001
            self._q.put(e)
        self._q.put(StopIteration())

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, StopIteration):
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()

    # pass through checkpointable state
    def state_dict(self):
        return self.loader.state_dict() if hasattr(self.loader,
                                                   "state_dict") else {}

    def load_state_dict(self, state):
        if hasattr(self.loader, "load_state_dict"):
            self.loader.load_state_dict(state)
