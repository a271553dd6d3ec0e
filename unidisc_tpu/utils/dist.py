"""Multi-host helpers (the reference's decoupled rank/world layer).

Redesign of decoupled_utils.py:75-214 (get_rank/world, barrier, rprint) for
JAX: process_index/process_count are first-class; collectives come from
GSPMD, so only host-coordination helpers remain. `initialize()` wires
jax.distributed for multi-host TPU pods (the reference's accelerate-launch /
SPMD-spawn analogue, main.py:541-749).
"""

from __future__ import annotations

import os
import sys
from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Initialize jax.distributed on a multi-host pod. On single-host (or
    under a test harness) this is a no-op. TPU pods auto-detect from the
    metadata server; explicit args cover GPU/CPU clusters."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator:
            jax.distributed.initialize(coordinator_address=coordinator,
                                       num_processes=num_processes,
                                       process_id=process_id)
        elif os.environ.get("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()
    except Exception:  # noqa: BLE001 — single-host fallback
        pass


def is_main_process() -> bool:
    return jax.process_index() == 0


def rprint(*args, **kw):
    """Rank-0-only print (reference: decoupled_utils rprint)."""
    if is_main_process():
        print(*args, **kw, flush=True)


def gprint(*args, **kw):
    """All-rank print with rank prefix (reference gprint)."""
    print(f"[rank {jax.process_index()}/{jax.process_count()}]", *args,
          **kw, flush=True)


def barrier(name: str = "barrier"):
    """Cross-host sync (reference: decoupled_utils.py:214)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def host_local_batch_size(global_batch: int) -> int:
    assert global_batch % jax.process_count() == 0, \
        f"global batch {global_batch} not divisible by " \
        f"{jax.process_count()} hosts"
    return global_batch // jax.process_count()
