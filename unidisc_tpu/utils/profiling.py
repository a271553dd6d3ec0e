"""Profiling utilities.

Redesign of the reference's profiler wrappers (reference:
decoupled_utils.py:704-748 Profiler/torch.profiler + tensorboard traces;
TPU xp.start_server/StepTrace main.py:1004-1009, model.py:1431). JAX-native:
jax.profiler traces viewable in XProf/TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class Profiler:
    """Trace a span of steps to a directory (xplane + perfetto)."""

    def __init__(self, log_dir: str, *, active_steps: int = 5,
                 warmup_steps: int = 2):
        self.log_dir = log_dir
        self.active = active_steps
        self.warmup = warmup_steps
        self._step = 0
        self._running = False

    def step(self):
        """Call once per train step; starts/stops the trace window."""
        if self._step == self.warmup:
            jax.profiler.start_trace(self.log_dir)
            self._running = True
        if self._step == self.warmup + self.active and self._running:
            jax.profiler.stop_trace()
            self._running = False
        self._step += 1

    def close(self):
        if self._running:
            jax.profiler.stop_trace()
            self._running = False


@contextlib.contextmanager
def annotate(name: str):
    """Named range in the profile (reference StepTrace/NVTX analogue)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def wall_timer(label: str, results: Optional[dict] = None):
    """Host-side phase timing (reference per-phase wall-times,
    model.py:1392,1435,1548)."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if results is not None:
        results[label] = results.get(label, 0.0) + dt


def memory_stats() -> dict:
    """Device memory snapshot (reference jax-smi/memory profiling,
    main.py:46-47,1017-1019)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d.id)] = {
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit")}
        except Exception:  # noqa: BLE001
            pass
    return out
