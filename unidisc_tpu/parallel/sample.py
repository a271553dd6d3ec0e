"""SPMD sampling/serving: run the diffusion samplers over a multi-chip
mesh — data-parallel batch sharding over ('dcn','fsdp'), optional
depth-wise pipeline parallelism ('pp' axis, GPipe over the block stack)
and sequence parallelism ('seq', ring attention) for models too large
or contexts too long for one chip.

The reference serves single-GPU only (demo/server.py builds one model
on one device); multi-chip *serving* has no reference counterpart.
Training already runs all five axes (training/train_state.py wraps the
step in the same contexts); this module gives inference the same
treatment: the sampler body is traced under `sequence_parallel` +
`pipeline_parallel`, so the DIT trunk routes itself through the GPipe
ring / ring attention exactly as in training (models/dit.py), and
GSPMD inserts the collectives for the fsdp/tensor-sharded weights.

Constraints:
  - pipeline (pp>1) requires model.n_blocks % pp == 0 and per-call
    batch % (pp_microbatches * dcn * fsdp) == 0 — use
    `batch_multiple()` to round serving batches up;
  - the KV-cache decode paths (AR continuous batching) stay off the
    pipeline (the trunk pipelines only when kv_cache is None); pp
    serving targets the diffusion samplers, which is where the
    large-model memory pressure is.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unidisc_tpu.config import Config


def batch_multiple(config: Config, mesh: Mesh) -> int:
    """Smallest batch granule the mesh can run: data-parallel width
    times (when pipelining) the microbatch count."""
    dp = mesh.shape.get("dcn", 1) * mesh.shape.get("fsdp", 1)
    if mesh.shape.get("pp", 1) > 1:
        return dp * config.mesh.pp_microbatches
    return dp


def validate_mesh(config: Config, mesh: Mesh) -> None:
    pp = mesh.shape.get("pp", 1)
    if pp > 1 and config.model.n_blocks % pp != 0:
        raise ValueError(
            f"model.n_blocks={config.model.n_blocks} not divisible by "
            f"pp={pp}")
    seq = mesh.shape.get("seq", 1)
    if seq > 1 and config.model.length % seq != 0:
        raise ValueError(
            f"model.length={config.model.length} not divisible by "
            f"seq={seq}")


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree onto the mesh under the standard rules
    (fsdp largest-dim + megatron tensor + pp-stacked layer groups —
    parallel/mesh.py:param_spec)."""
    from unidisc_tpu.parallel.mesh import params_shardings
    return jax.device_put(params, params_shardings(params, mesh))


def spmd_sampler(sample_fn: Callable, config: Config, mesh: Mesh) -> Callable:
    """Wrap a built sampler `(params, rng, *batch_args) -> SampleResult`
    for SPMD execution on `mesh`.

    The wrapper enters the parallelism contexts at TRACE time (the same
    pattern as make_train_step), so the model routes its trunk through
    GPipe / ring attention when those axes are >1; weights should be
    placed with shard_params(), and every batch arg is device_put to
    P(('dcn','fsdp')) on its leading dim before the call.
    """
    validate_mesh(config, mesh)
    micro = config.mesh.pp_microbatches
    mult = batch_multiple(config, mesh)

    def wrapped(params, rng, *args):
        from unidisc_tpu.parallel.pipeline import pipeline_parallel
        from unidisc_tpu.parallel.seq_parallel import sequence_parallel
        with sequence_parallel(mesh), pipeline_parallel(mesh, micro):
            return sample_fn(params, rng, *args)

    rep = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P(("dcn", "fsdp")))

    # shardings flow from committed inputs (shard_params for the weights,
    # device_put below for the batch) rather than jit in_shardings — the
    # arg list is sampler-specific and variadic
    jitted = jax.jit(wrapped)

    def call(params, rng, *args):
        b = args[0].shape[0] if args else None
        if b is not None and b % mult != 0:
            raise ValueError(
                f"batch {b} not a multiple of the mesh granule {mult} "
                f"(dp x pp_microbatches); pad with batch_multiple()")
        placed = tuple(jax.device_put(a, dp) for a in args)
        return jitted(params, jax.device_put(rng, rep), *placed)

    return call
