"""Small JAX-version compatibility helpers for the parallel package."""

from __future__ import annotations

import jax


def vary(x, axis_name):
    """Mark a freshly-created (device-invariant) array as VARYING over a
    manual-mesh axis so shard_map scan carries type-check. The pcast/
    pvary API is still settling across JAX versions — this is the single
    shared shim (used by the ring bodies and the GPipe schedule)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)
