"""Sequence-parallel training context.

Gates the DIT's attention onto the ring kernel
(parallel/ring_attention.py) when the train step runs on a mesh with a
'seq' axis > 1. Everything else in the model is pointwise or contracts
only the feature dimension, so GSPMD shards it over 'seq' from the input
sharding alone; attention is the one op that mixes sequence positions,
and without the ring XLA would all-gather K/V across the axis
(O(L) memory per chip — exactly what sequence parallelism exists to
avoid).

The context is trace-time Python state: `make_train_step` enters it
inside the step function body, so the ring branch is baked into the
jitted program only for seq-parallel meshes. Sampling/eval paths never
set it and are unaffected.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

from jax.sharding import Mesh

_STATE = threading.local()


@contextlib.contextmanager
def sequence_parallel(mesh: Optional[Mesh], axis: str = "seq"):
    """Enable ring attention over `axis` for model traces inside the
    context. A mesh without the axis (or size 1) is a no-op."""
    if mesh is None or mesh.shape.get(axis, 1) <= 1:
        yield
        return
    prev = getattr(_STATE, "value", None)
    _STATE.value = (mesh, axis)
    try:
        yield
    finally:
        _STATE.value = prev


def current_seq_mesh() -> Optional[Tuple[Mesh, str]]:
    """(mesh, axis) when tracing under sequence_parallel, else None."""
    return getattr(_STATE, "value", None)
