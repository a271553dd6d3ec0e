"""Host-offloaded fp32-master training: big-model training on one chip.

TPU-native answer to the reference's "shard it across GPUs" memory story
(reference FSDP, main.py:584-695): a v5e chip has 16GB HBM but its host
has ~8x more RAM one PCIe hop away, and JAX exposes it as the
`pinned_host` memory kind. This module keeps the WORKING weights in HBM
in bf16 and banishes everything the forward/backward never touches —
the fp32 master copy, the optimizer moments, the EMA — to host memory.

Why not `trainer.low_precision_params` (the pure-bf16-state mode that
also fits 1.4B on one chip)? fp32-master update quality: per-step
updates of order lr*grad vanish in a bf16 accumulator but not in the
fp32 master — the classic mixed-precision argument.

DESIGN (what actually works on this runtime — every alternative below
was built and measured first, scripts/bench_offload.py +
probe_offload_{variants,chunks,scan}.py, round 4):

  * ONE jitted program with `compute_on("device_host")` sections per
    chunk: the runtime stages every HostExecute operand through HBM and
    materializes the host program's intermediates as UNFUSED HBM temps
    — 23.9-27.2G requested at 1.4B. Dead end.
  * ONE jitted program streaming chunks to device compute, serialized
    with `lax.optimization_barrier`: XLA's host-offload legalization
    walks copies straight through barriers, so every chunk's
    host->HBM `copy-start` is hoisted to program start — 25.5G of
    copy-start temps. Dead end.
  * `lax.scan` over host-resident xs (per-iteration slices can't be
    hoisted): crashes this runtime's remote TPU compiler outright,
    at any size. Dead end (re-probe when the toolchain moves:
    scripts/probe_offload_scan.py).
  * WHAT SHIPS: a fixed pipeline of SMALL jitted programs per step —
    one grad program (fwd/bwd on the bf16 weights + global-norm clip;
    gradients leave as the TREE — flattening them inside the grad
    program tripled the gradient footprint and was the 1.4B runtime
    OOM), then K chunk-update programs (each extracts its own gradient
    fragments with static slices, streams its fp32 flat chunk
    host->HBM->host, and computes the fused update on-device), then
    one assemble program (flat bf16 rows -> the model's parameter
    tree). Each update program touches a single chunk, so its HBM
    staging is ~5 x total/K by construction; the donated host buffers
    alias in place. Dispatch cost is K+2 calls per step —
    microseconds in production, and even on this ~130ms/RPC tunnel it
    is small next to the PCIe round-trip of the fp32 state.

The optimizer update is a hand-fused flat implementation with EXACT
optax semantics (asserted element-for-element in tests/test_train_step
against optax.adamw/optax.lion): flat vectors admit no per-parameter
shape logic, which rules out adafactor (factored second moment) and
muP (per-path LR multipliers) — both asserted off. The NaN-skip guard,
EMA update, and clip-by-global-norm match training/train_state.py
bit-for-bit in semantics (clip applied on-device BEFORE chunking so the
norm is global).

Capability gating: the pinned_host placements need a TPU runtime
(`annotate=True`); tests run the same programs with `annotate=False`
(plain device residence) and assert equivalence against the
resident-state reference step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from unidisc_tpu.config import Config
from unidisc_tpu.training.train_state import (_split_metrics,
                                              compute_batch_loss,
                                              make_apply_fn,
                                              make_lr_schedule)

SUPPORTED_OPTIMIZERS = ("adamw", "lion")


# ---------------------------------------------------------------------------
# Flat layout
# ---------------------------------------------------------------------------

class FlatSpec(NamedTuple):
    """Static description of the params-tree <-> flat-chunk mapping."""
    paths: Tuple[str, ...]
    shapes: Tuple[Tuple[int, ...], ...]
    chunks: int       # K
    chunk_size: int   # C; K*C >= sum(prod(shape))

    @property
    def total(self) -> int:
        return sum(int(np.prod(s)) for s in self.shapes)


def _flat_dict(params):
    import flax
    return dict(flax.traverse_util.flatten_dict(params, sep="/"))


def _unflat_dict(flat):
    import flax
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def make_flat_spec(params, chunks: int) -> FlatSpec:
    flat = _flat_dict(params)
    paths = tuple(sorted(flat))
    shapes = tuple(tuple(flat[p].shape) for p in paths)
    total = sum(int(np.prod(s)) for s in shapes)
    chunk_size = -(-total // chunks)  # ceil
    # keep lanes happy for the elementwise update kernels
    chunk_size = -(-chunk_size // 128) * 128
    return FlatSpec(paths=paths, shapes=shapes, chunks=chunks,
                    chunk_size=chunk_size)


def tree_to_rows(tree, spec: FlatSpec, dtype) -> jax.Array:
    """Pack a params-like tree into [K, C] rows (zero-padded tail)."""
    flat = _flat_dict(tree)
    vec = jnp.concatenate(
        [flat[p].reshape(-1).astype(dtype) for p in spec.paths])
    pad = spec.chunks * spec.chunk_size - spec.total
    vec = jnp.pad(vec, (0, pad))
    return vec.reshape(spec.chunks, spec.chunk_size)


def chunk_row(tree, spec: FlatSpec, k: int, dtype) -> jax.Array:
    """Chunk k's flat row, built from only the leaf fragments it covers
    (static slices — no full-state materialization, which matters for
    the per-chunk init programs)."""
    flat = _flat_dict(tree)
    C = spec.chunk_size
    lo, hi = k * C, min((k + 1) * C, spec.total)
    parts, off = [], 0
    for p, s in zip(spec.paths, spec.shapes):
        n = int(np.prod(s))
        a, b = max(lo, off), min(hi, off + n)
        if a < b:
            parts.append(jax.lax.slice_in_dim(
                flat[p].reshape(-1), a - off, b - off).astype(dtype))
        off += n
    row = jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)
    return jnp.pad(row, (0, C - row.shape[0]))


def rows_to_tree(rows, spec: FlatSpec, dtype):
    """Unpack [K, C] rows (or a K-tuple of [C]) into the params tree."""
    if isinstance(rows, (tuple, list)):
        vec = jnp.concatenate(list(rows))
    else:
        vec = rows.reshape(-1)
    out, off = {}, 0
    for p, s in zip(spec.paths, spec.shapes):
        n = int(np.prod(s))
        out[p] = jax.lax.dynamic_slice_in_dim(vec, off, n).reshape(
            s).astype(dtype)
        off += n
    return _unflat_dict(out)


# ---------------------------------------------------------------------------
# Fused flat optimizer updates (exact optax semantics)
# ---------------------------------------------------------------------------

def _fused_update(config: Config, m, mu, nu, g32, step):
    """One flat-chunk optimizer update. Matches optax.adamw / optax.lion
    applied at optax count==step element-for-element (asserted in
    tests/test_train_step.py::test_offload_fused_update_matches_optax).
    `step` is the state's opt_count — the count of APPLIED updates, not
    attempted steps — so lr and bias correction track optax across
    NaN-skips. Returns (new_master, new_mu, new_nu)."""
    t = config.trainer
    lr = make_lr_schedule(config)(step)
    s1 = (step + 1).astype(jnp.float32)
    if t.optimizer == "adamw":
        mu2 = t.beta1 * mu + (1.0 - t.beta1) * g32
        nu2 = t.beta2 * nu + (1.0 - t.beta2) * g32 * g32
        mu_hat = mu2 / (1.0 - jnp.power(t.beta1, s1))
        nu_hat = nu2 / (1.0 - jnp.power(t.beta2, s1))
        upd = mu_hat / (jnp.sqrt(nu_hat) + t.opt_eps) + t.weight_decay * m
        return m - lr * upd, mu2, nu2
    if t.optimizer == "lion":
        direction = jnp.sign(t.beta1 * mu + (1.0 - t.beta1) * g32)
        mu2 = t.beta2 * mu + (1.0 - t.beta2) * g32
        upd = direction + t.weight_decay * m
        return m - lr * upd, mu2, nu
    raise ValueError(
        f"host offload supports {SUPPORTED_OPTIMIZERS}, not "
        f"{t.optimizer!r} (flat chunks admit no per-parameter shapes — "
        f"adafactor's factored moments and muP multipliers can't ride)")


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------

class OffloadTrainState(struct.PyTreeNode):
    step: jax.Array
    # optimizer update count: advances only on a FINITE loss, like the
    # resident path's optax count (which is restored wholesale on a
    # NaN-skip) — _fused_update derives lr and bias correction from it,
    # so after a NaN-skip both trajectories stay aligned. `step` keeps
    # counting every attempted step (rng fold-in, logging).
    opt_count: jax.Array
    params: Any                       # structured bf16 tree, device HBM
    masters: Tuple[jax.Array, ...]    # K x f32[C], pinned_host
    mus: Tuple[jax.Array, ...]        # first moment, pinned_host
    nus: Tuple[jax.Array, ...]        # second moment (adamw), pinned_host
    emas: Tuple[jax.Array, ...]       # fp32 EMA of the master, pinned_host
    spec: FlatSpec = struct.field(pytree_node=False)


def _host_sharding():
    return jax.sharding.SingleDeviceSharding(jax.devices()[0],
                                             memory_kind="pinned_host")


def _dev_sharding():
    return jax.sharding.SingleDeviceSharding(jax.devices()[0])


def init_offload_state(config: Config, params: Any, *,
                       annotate: bool = True,
                       chunks: int = 8) -> OffloadTrainState:
    """params: the fp32 init tree (becomes the master; a bf16 copy stays
    on the device as the working weights). chunks: flat host-state
    pieces the per-step update streams through — each update program's
    HBM transient is ~5x(state/chunks); 8 fits 1.4B AdamW on a 16G
    v5e."""
    assert config.trainer.optimizer in SUPPORTED_OPTIMIZERS, (
        f"host offload supports {SUPPORTED_OPTIMIZERS}; "
        f"got {config.trainer.optimizer!r}")
    assert not config.model.mup, \
        "offload training does not support muP (per-path LR multipliers " \
        "don't survive the flat re-keying)"
    spec = make_flat_spec(params, chunks)
    host = _host_sharding() if annotate else None
    K, C = spec.chunks, spec.chunk_size

    work = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), p))(params)

    # one small program per chunk keeps the init HBM transient at
    # ~(params + 2 chunk rows) — a single all-chunks program would
    # stage the whole fp32 state (the step-design lesson, module
    # docstring, applies to init too)
    def master_chunk(p, k):
        row = chunk_row(p, spec, k, jnp.float32)
        return row, row  # (master, ema init = copy)

    fn = jax.jit(master_chunk, static_argnums=1,
                 out_shardings=(host, host) if annotate else None)
    masters, emas = [], []
    for k in range(K):
        m, e = fn(params, k)
        masters.append(m)
        emas.append(e)

    zeros = jax.jit(lambda: jnp.zeros((C,), jnp.float32),
                    out_shardings=host if annotate else None)
    mus = [zeros() for _ in range(K)]
    nus = [zeros() for _ in range(K)]
    return OffloadTrainState(
        step=jnp.zeros((), jnp.int32),
        opt_count=jnp.zeros((), jnp.int32), params=work,
        masters=tuple(masters), mus=tuple(mus), nus=tuple(nus),
        emas=tuple(emas), spec=spec)


# ---------------------------------------------------------------------------
# Step programs
# ---------------------------------------------------------------------------

def make_offload_train_step(config: Config, model, *, annotate: bool = True):
    """Returns a PYTHON callable (state, batch, rng) -> (state, metrics)
    that runs a fixed pipeline of jitted programs: grad -> K x update ->
    assemble (module docstring explains why it cannot be one program on
    this runtime). All heavy arrays stay on device/host — per step the
    only host<->HBM traffic is the fp32 state round-trip plus one bf16
    grad row down per chunk."""
    t_cfg = config.trainer
    ema_decay = t_cfg.ema_decay
    clip = t_cfg.gradient_clip_val
    assert t_cfg.grad_accum_steps == 1, \
        "offload step does not implement scan microbatching (raise the " \
        "per-step batch instead — HBM freed by the offload is the point)"
    apply_fn = make_apply_fn(config, model)
    host = _host_sharding() if annotate else None
    dev = _dev_sharding() if annotate else None

    def _build(spec: FlatSpec):
        def grad_program(params, batch, rng, step):
            rng = jax.random.fold_in(rng, step)

            def loss_fn(params, rng, batch):
                out = compute_batch_loss(config, apply_fn, params, rng,
                                         batch, train=True, step=step)
                return out.loss, out

            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, rng, batch)
            grad_norm = jnp.sqrt(sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)))
            # clip_by_global_norm semantics, applied pre-chunking so the
            # norm is global (optax: g * clip/norm when norm > clip)
            scale = jnp.where(grad_norm > clip, clip / grad_norm, 1.0)
            ok = jnp.isfinite(loss)
            metrics = _split_metrics(out, batch.get("modality"), loss,
                                     grad_norm)
            # grads leave as the TREE — the update programs extract
            # their own fragments with static slices, so no flat copy
            # of the full gradient ever materializes (at 1.4B the
            # tree+vec+rows triple was the runtime-OOM, measured)
            return grads, scale, ok, metrics

        def update_program(k, m, mu, nu, e, grads, scale, ok, count):
            g32 = chunk_row(grads, spec, k, jnp.float32) * scale
            n_m, n_mu, n_nu = _fused_update(config, m, mu, nu, g32,
                                            count)
            # NaN-skip guard: a non-finite loss leaves master/moments/
            # EMA untouched and re-derives the working weights from the
            # untouched master
            n_m = jnp.where(ok, n_m, m)
            n_mu = jnp.where(ok, n_mu, mu)
            n_nu = jnp.where(ok, n_nu, nu)
            n_e = jnp.where(ok, e * ema_decay + n_m * (1.0 - ema_decay),
                            e)
            # the new optimizer count rides out of the (tiny) update
            # program — computing it on the host would cost a dispatch
            n_count = count + ok.astype(jnp.int32)
            return n_m, n_mu, n_nu, n_e, n_m.astype(jnp.bfloat16), n_count

        def assemble_program(w_rows):
            return rows_to_tree(w_rows, spec, jnp.bfloat16)

        jit_update = jax.jit(
            update_program,
            static_argnums=0,
            donate_argnums=(1, 2, 3, 4) if annotate else (),
            in_shardings=((host,) * 4 + (None,) * 4) if annotate
            else None,
            out_shardings=((host,) * 4 + (dev, dev)) if annotate
            else None)
        return (jax.jit(grad_program), jit_update,
                jax.jit(assemble_program,
                        donate_argnums=0 if annotate else ()))

    programs = {}

    def train_step(state: OffloadTrainState, batch, rng):
        spec = state.spec
        if spec not in programs:
            programs[spec] = _build(spec)
        grad_fn, update_fn, assemble_fn = programs[spec]
        grads, scale, ok, metrics = grad_fn(state.params, batch, rng,
                                            state.step)
        n_masters, n_mus, n_nus, n_emas, w_rows = [], [], [], [], []
        n_count = state.opt_count
        for k in range(spec.chunks):
            n_m, n_mu, n_nu, n_e, w, n_count = update_fn(
                k, state.masters[k], state.mus[k], state.nus[k],
                state.emas[k], grads, scale, ok, state.opt_count)
            n_masters.append(n_m)
            n_mus.append(n_mu)
            n_nus.append(n_nu)
            n_emas.append(n_e)
            w_rows.append(w)
        del grads  # free the gradient tree before the assemble copy
        params = assemble_fn(tuple(w_rows))
        return state.replace(step=state.step + 1, opt_count=n_count,
                             params=params,
                             masters=tuple(n_masters), mus=tuple(n_mus),
                             nus=tuple(n_nus),
                             emas=tuple(n_emas)), metrics

    return train_step


# ---------------------------------------------------------------------------
# Gather (checkpoint / EMA eval)
# ---------------------------------------------------------------------------

def gather_master(state: OffloadTrainState):
    """Full fp32 master tree (single program; staging = full state, fine
    for checkpoint-time use)."""
    return jax.jit(rows_to_tree, static_argnums=(1, 2))(
        tuple(state.masters), state.spec, jnp.float32)


def gather_ema(state: OffloadTrainState):
    """Full fp32 EMA tree — the weights the reference evaluates/serves
    (model_eval.py:157-166)."""
    return jax.jit(rows_to_tree, static_argnums=(1, 2))(
        tuple(state.emas), state.spec, jnp.float32)
