"""Metric logging: JSONL file + console + optional wandb.

Replaces the reference's wandb-only logging (reference: main.py:101-147
instantiate_wandb; model_utils.py:49-55 log wrapper; buffered /dev/shm file
logger logging_utils.py:10-88). wandb is optional here — when absent,
metrics land in a JSONL run log that tooling can tail.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricLogger:
    def __init__(self, run_dir: str, *, use_wandb: bool = False,
                 project: str = "unidisc-tpu", run_name: Optional[str] = None,
                 console_every: int = 1):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self.console_every = console_every
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name,
                                         dir=run_dir, resume="allow")
            except ImportError:
                print("[logger] wandb unavailable; JSONL only",
                      file=sys.stderr)

    def log(self, metrics: dict, step: int):
        record = {"step": int(step), "time": time.time(),
                  **{k: (float(v) if hasattr(v, "__float__") else v)
                     for k, v in metrics.items()}}
        self._f.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.console_every and step % self.console_every == 0:
            parts = " ".join(f"{k}={v:.4g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in record.items()
                             if k not in ("time",))
            print(f"[{time.strftime('%H:%M:%S')}] {parts}", flush=True)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
