"""Throughput / MFU monitoring.

Re-design of the reference's torchtnt ThroughputMonitor callback
(reference: unidisc/utils/throughput_monitor.py:227-310 windowed
samples/sec, tokens/sec, MFU vs device peak FLOPs incl. TPU tables
:304-635; 6ND FLOPs estimate model_setup.py:823).
"""

from __future__ import annotations

import time
from collections import deque
from typing import Optional

import jax

# peak bf16 dense FLOPs per chip (reference table: throughput_monitor.py:549+
# get_available_flops; TPU numbers from public spec sheets)
PEAK_FLOPS = {
    "tpu v2": 22.5e12,
    "tpu v3": 61.5e12,  # per chip (2 cores)
    "tpu v4": 137.5e12,
    "tpu v5e": 197e12,
    "tpu v5 lite": 197e12,
    "tpu v5p": 229.5e12,
    "tpu v6e": 459e12,
    "cpu": None,
}


def device_peak_flops(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for name, flops in PEAK_FLOPS.items():
        if name in kind:
            return flops
    return None


def flops_per_token(n_params: int) -> float:
    """6N per token (fwd+bwd) — the standard transformer estimate the
    reference uses (model_setup.py:823: 6 * length * non_embedding_params)."""
    return 6.0 * n_params


class ThroughputMonitor:
    """Windowed samples/sec, tokens/sec/device, and MFU."""

    def __init__(self, n_params: int, window: int = 50,
                 n_devices: Optional[int] = None, warmup: int = 1):
        self.n_params = n_params
        self.n_devices = n_devices or jax.device_count()
        self.peak = device_peak_flops()
        self._events = deque(maxlen=window)
        # skip the first `warmup` steps — they include compile time
        # (reference excludes the warmup batch, model_eval.py:983-1014)
        self._skip = warmup

    def step(self, samples: int, tokens: int, now: Optional[float] = None):
        if self._skip > 0:
            self._skip -= 1
            return
        self._events.append((now if now is not None else time.perf_counter(),
                             samples, tokens))

    def stats(self) -> dict:
        if len(self._events) < 2:
            return {}
        t0, *_ = self._events[0]
        t1, *_ = self._events[-1]
        dt = max(t1 - t0, 1e-9)
        samples = sum(s for _, s, _ in list(self._events)[1:])
        tokens = sum(tk for _, _, tk in list(self._events)[1:])
        out = {
            "samples_per_sec": samples / dt,
            "tokens_per_sec": tokens / dt,
            "tokens_per_sec_per_device": tokens / dt / self.n_devices,
        }
        if self.peak:
            achieved = flops_per_token(self.n_params) * tokens / dt
            out["mfu"] = achieved / (self.peak * self.n_devices)
        return out


class PhaseTimer:
    """Windowed per-phase wall-time accumulator for the train loop
    (reference: per-step dataloading/forward/backward/grad-sync wall-times,
    model.py:1392/1435/1548; on XLA the device step is async so the
    'dispatch' phase measures enqueue time, not compute — compute shows up
    in tokens/sec instead).

    Usage: with timer("data"): batch = next(it)  ... stats() -> mean ms.
    """

    def __init__(self, window: int = 50):
        from collections import defaultdict, deque
        self._window = window
        self._times = defaultdict(lambda: deque(maxlen=window))

    def __call__(self, phase: str):
        import contextlib
        import time as _t

        @contextlib.contextmanager
        def span():
            t0 = _t.perf_counter()
            try:
                yield
            finally:
                self._times[phase].append(_t.perf_counter() - t0)
        return span()

    def add(self, phase: str, seconds: float):
        self._times[phase].append(seconds)

    def stats(self) -> dict:
        out = {}
        for phase, xs in self._times.items():
            if xs:
                out[f"{phase}_ms"] = round(1e3 * sum(xs) / len(xs), 3)
        return out
