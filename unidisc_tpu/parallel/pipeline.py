"""Pipeline parallelism: GPipe-style microbatch pipelining over a mesh
axis, built on shard_map + ppermute.

The layer stack (n_layers, ...) params shard over a 'pp' axis — each
device holds a contiguous group of layers resident in its own HBM, so
models too large for one chip's memory split DEPTH-wise (complementing
FSDP's weight sharding, which still gathers full layers through the
compute). Microbatches flow down the ring: at tick t, stage 0 injects
microbatch t, every stage applies its layer group, activations
`ppermute` one stage down, and the last stage emits microbatch
t-(P-1). The bubble is the standard (P-1)/(M+P-1).

Autodiff: the whole schedule is a `lax.scan` of per-tick compute +
ppermute, so `jax.grad` through it IS the reverse pipeline — no
hand-written backward schedule.

No reference counterpart (the reference scales with FSDP only,
xla_utils.py:79-267); this is the TPU-native depth-wise scale-out.
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_STATE = threading.local()


@contextlib.contextmanager
def pipeline_parallel(mesh: Optional[Mesh], microbatches: int = 4,
                      axis: str = "pp"):
    """Enable pipelined trunk execution for model traces inside the
    context (models/dit.py routes its block stack through
    pipeline_apply). A mesh without the axis (or size 1) is a no-op."""
    if mesh is None or mesh.shape.get(axis, 1) <= 1:
        yield
        return
    prev = getattr(_STATE, "value", None)
    _STATE.value = (mesh, axis, microbatches)
    try:
        yield
    finally:
        _STATE.value = prev


def current_pp() -> Optional[Tuple[Mesh, str, int]]:
    """(mesh, axis, microbatches) when tracing under pipeline_parallel."""
    return getattr(_STATE, "value", None)


from unidisc_tpu.parallel.compat import vary as _vary


def pipeline_apply(stage_fn: Callable, params_local, x_mb, mb_args=(),
                   *broadcast_args, axis_name: str = "pp"):
    """Per-shard GPipe body (call INSIDE shard_map).

    Args:
      stage_fn: (params_local, activation, mb_args_t, *broadcast_args)
        -> activation — applies THIS stage's layer group (params_local
        is the local (n_layers/P, ...) slice of the stacked params).
      x_mb: (M, mb, ...) microbatched input, replicated across stages
        (only stage 0 reads it).
      mb_args: pytree of (M, mb, ...) PER-MICROBATCH operands
        (conditioning, modality, masks). At tick t, stage s processes
        microbatch t-s, so each stage indexes mb_args at its own offset
        — no extra communication.
      broadcast_args: microbatch-invariant operands (rope tables).

    Returns (M, mb, ...) outputs, psum-replicated across the axis.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    m_micro = x_mb.shape[0]
    ticks = m_micro + n - 1
    perm = [(i, (i + 1) % n) for i in range(n)]

    a0 = _vary(jnp.zeros_like(x_mb[0]), axis_name)
    outs0 = _vary(jnp.zeros_like(x_mb), axis_name)

    def tick(carry, t):
        a_in, outs = carry
        inject = x_mb[jnp.clip(t, 0, m_micro - 1)]
        a = jnp.where(idx == 0, inject, a_in)
        # the microbatch currently at THIS stage
        mb_t = jnp.clip(t - idx, 0, m_micro - 1)
        args_t = jax.tree_util.tree_map(
            lambda e: jax.lax.dynamic_index_in_dim(e, mb_t,
                                                   keepdims=False),
            mb_args)
        a = stage_fn(params_local, a, args_t, *broadcast_args)
        emit = t - (n - 1)
        is_last = idx == n - 1
        write = is_last & (emit >= 0)
        slot = jnp.clip(emit, 0, m_micro - 1)
        prev = jax.lax.dynamic_index_in_dim(outs, slot, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(write, a, prev), slot, 0)
        a_next = jax.lax.ppermute(a, axis_name, perm)
        return (a_next, outs), None

    (_, outs), _ = jax.lax.scan(tick, (a0, outs0), jnp.arange(ticks))
    # only the last stage holds real outputs; zero the rest and psum so
    # every stage returns the replicated result
    outs = jnp.where(idx == n - 1, outs, 0.0)
    return jax.lax.psum(outs, axis_name)


def pipeline_sharded(stage_fn: Callable, stacked_params, x, mesh: Mesh,
                     *broadcast_args, mb_args=(), pp_axis: str = "pp",
                     microbatches: int = 4, batch_axes=None,
                     seq_axis=None, x_seq_dim=None, mb_seq_dims=None,
                     bcast_seq_dims=None):
    """Jit-level entry: run a stacked layer sequence as a pipeline.

    stacked_params: pytree with a leading (n_layers, ...) axis on every
    leaf; layer groups shard over `pp_axis`. x: (B, ...) input; the batch
    splits into `microbatches` along axis 0 (B % microbatches == 0,
    n_layers % P == 0). mb_args: pytree of (B, ...) per-sample operands,
    microbatched alongside x. stage_fn sees the LOCAL (n_layers/P, ...)
    params and must scan over them:
    stage_fn(params_local, a, mb_args_t, *broadcast_args) -> a.

    Sequence-parallel composition (seq x pp meshes): pass `seq_axis` plus
    the POST-microbatch sequence dim of x (`x_seq_dim`), a pytree of
    per-leaf seq dims for mb_args (`mb_seq_dims`, None = not L-shaped),
    and per-arg dims for broadcast_args (`bcast_seq_dims`). The L axis
    then STAYS sharded over `seq_axis` inside each stage — attention in
    the stage body runs the ring directly (all mesh axes are manual
    inside this shard_map), instead of the pp boundary all-gathering L.
    """
    n = mesh.shape[pp_axis]
    bsz = x.shape[0]
    if bsz % microbatches != 0:
        raise ValueError(f"batch {bsz} not divisible by "
                         f"microbatches {microbatches}")
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % n != 0:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{pp_axis} axis size {n}")
    mb = bsz // microbatches
    x_mb = x.reshape(microbatches, mb, *x.shape[1:])
    mb_args = jax.tree_util.tree_map(
        lambda e: e.reshape(microbatches, mb, *e.shape[1:]), mb_args)

    body = functools.partial(pipeline_apply, stage_fn,
                             axis_name=pp_axis)
    param_specs = jax.tree_util.tree_map(
        lambda p: P(pp_axis, *([None] * (p.ndim - 1))), stacked_params)
    # the per-microbatch row axis (dim 1 of (M, mb, ...)) keeps its data
    # sharding — without this every data-parallel replica would
    # all-gather the global batch and duplicate the whole trunk compute
    def dspec(e, seq_dim=None):
        dims = [None] * e.ndim
        if batch_axes is not None:
            dims[1] = batch_axes
        if seq_axis is not None and seq_dim is not None:
            dims[seq_dim] = seq_axis
        if all(d is None for d in dims):
            return P()
        return P(*dims)
    if mb_seq_dims is None:
        mb_specs = jax.tree_util.tree_map(dspec, mb_args)
    else:
        # mb_seq_dims: flat {key: seq_dim_or_None} over a dict mb_args
        mb_specs = {k: dspec(v, mb_seq_dims.get(k))
                    for k, v in mb_args.items()}
    if bcast_seq_dims is None:
        bcast_specs = tuple(P() for _ in broadcast_args)
    else:
        bcast_specs = tuple(
            (P() if (d is None or seq_axis is None)
             else P(*[seq_axis if k == d else None
                      for k in range(a.ndim)]))
            for a, d in zip(broadcast_args, bcast_seq_dims))
    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(param_specs, dspec(x_mb, x_seq_dim), mb_specs)
        + bcast_specs,
        out_specs=dspec(x_mb, x_seq_dim), check_vma=False,
    )(stacked_params, x_mb, mb_args, *broadcast_args)
    return out.reshape(bsz, *out.shape[2:])
