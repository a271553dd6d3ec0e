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


def enable_compile_cache(path: str = "~/.cache/unidisc_tpu_xla"):
    """Persistent XLA compilation cache (reference: xr.initialize_cache,
    main.py:1011-1015). First compiles are 20-40s; cached reloads are
    sub-second across processes."""
    import os
    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def host_batch_to_global(batch: dict, mesh, data_sharding):
    """Assemble per-host local batches into one global sharded array
    (multi-host pods: each host feeds its slice; reference analogue is the
    SPMD dataloader sharding, xla_utils.py:270-278)."""
    from jax.experimental import multihost_utils
    return {
        k: multihost_utils.host_local_array_to_global_array(
            v, mesh, data_sharding.spec)
        for k, v in batch.items()
    }


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


def param_hash(params) -> str:
    """Deterministic hash of a parameter pytree (reference determinism
    hashes: module_hash/parameter_hash decoupled_utils.py:423-436, printed
    at start/ckpt to catch cross-rank/resume divergence).

    Multi-host safe: sharded global arrays span non-addressable devices
    (device_get would throw), so each host hashes its ADDRESSABLE shards in
    deterministic order and the per-host digests are allgathered into one
    global hash — identical on every host iff every host's shards agree."""
    import hashlib

    import numpy as np
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "addressable_shards"):
            shards = sorted(leaf.addressable_shards,
                            key=lambda s: str(s.index))
            for sh in shards:
                h.update(np.asarray(sh.data).tobytes())
        else:
            h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:16]
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        local = np.frombuffer(bytes.fromhex(digest), np.uint8)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        return hashlib.sha256(gathered.tobytes()).hexdigest()[:16]
    return digest


def host_local_batch_size(global_batch: int) -> int:
    assert global_batch % jax.process_count() == 0, \
        f"global batch {global_batch} not divisible by " \
        f"{jax.process_count()} hosts"
    return global_batch // jax.process_count()
