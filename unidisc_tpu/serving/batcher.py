"""Request batcher: coalesce concurrent requests into one device batch.

The reference serves one request per GPU worker through an mp.Queue
(reference: demo/server.py:117-219 — queue per worker, random load
balancing). On TPU the jitted sampler's throughput rises with batch (the
per-chip optimum is B16 at 115M after the chunked-attention fix —
BASELINE.md), so the scale-out unit is the BATCH, not the process: a
single background worker drains a queue, groups compatible requests
(same sampler kind + steps), pads the group to the next power-of-two
batch (few compiled shapes), runs the sampler ONCE, and resolves each
request's Future with its row.

Seed semantics: a batched run draws from one RNG key (derived from the
first request's seed and the batch composition), so exact per-seed
reproducibility holds only for batches of one — requests that need it
pass no_batch=True and run alone.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, List, Optional

PAD_SIZES = (1, 2, 4, 8, 16)


@dataclass
class _Pending:
    prepared: dict
    steps: Optional[int]
    seed: int
    future: Future = field(default_factory=Future)

    @property
    def group_key(self):
        return (bool(self.prepared["fastpath"]), self.steps)


class RequestBatcher:
    """Submit requests; a worker thread micro-batches them into the engine.

    Args:
      engine: InferenceEngine.
      max_batch: largest device batch (per-chip optimum).
      max_wait_ms: how long the worker waits to fill a batch once the
        first request of a group arrives.
    """

    def __init__(self, engine, *, max_batch: int = 16,
                 max_wait_ms: float = 25.0):
        assert max_batch in PAD_SIZES
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self.batches_run = 0          # stats for tests/monitoring
        self.requests_served = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, *, text=None, image_ids=None, image_mask=None,
               task="auto", steps=None, seed=0,
               no_batch: bool = False) -> Future:
        prepared = self.engine.prepare(text=text, image_ids=image_ids,
                                       image_mask=image_mask, task=task)
        item = _Pending(prepared, steps, seed)
        if no_batch:
            item.group_key_override = None  # run alone: unique object id
        self._q.put(item)
        return item.future

    def run(self, **kw) -> dict:
        """Blocking convenience wrapper."""
        return self.submit(**kw).result()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _worker(self):
        import time
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            group: List[_Pending] = [first]
            leftovers: List[_Pending] = []
            deadline = time.monotonic() + self.max_wait
            solo = getattr(first, "group_key_override", "n/a") is None
            while (not solo and len(group) < self.max_batch
                   and time.monotonic() < deadline):
                try:
                    nxt = self._q.get(timeout=max(
                        deadline - time.monotonic(), 0.001))
                except queue.Empty:
                    break
                if (getattr(nxt, "group_key_override", "n/a") is None or
                        nxt.group_key != first.group_key):
                    leftovers.append(nxt)  # different group: requeue
                else:
                    group.append(nxt)
            for item in leftovers:
                self._q.put(item)

            pad_to = next(p for p in PAD_SIZES if p >= len(group))
            try:
                seed = first.seed
                for i, g in enumerate(group[1:], 1):
                    seed = (seed * 1_000_003 + g.seed + i) % (2 ** 31)
                results = self.engine.run_batch(
                    [g.prepared for g in group],
                    steps=first.steps, seed=seed, pad_to=pad_to)
                self.batches_run += 1
                self.requests_served += len(group)
                for g, r in zip(group, results):
                    g.future.set_result(r)
            except Exception as e:  # noqa: BLE001
                for g in group:
                    if not g.future.done():
                        g.future.set_exception(e)
