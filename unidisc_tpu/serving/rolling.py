"""Rolling (continuous) batching for DIFFUSION sampling.

The AR continuous batcher (serving/continuous.py) keeps a persistent
device batch where every row is at its own decode position. This module
gives the masked-diffusion samplers the same treatment: every slot row
carries its OWN denoise step index, so new text->image / infill requests
are admitted into finished slots mid-flight instead of waiting for the
whole batch to finish (the reference — and our micro-batching engine —
run diffusion strictly whole-batch: demo/inference.py:63 samples one
fixed batch per call).

Design (TPU-native):
  - one persistent `RollingState` on device; the hot loop is ONE jitted
    `step_chunk` program (a lax.scan over K denoise iterations), so
    dispatch count stays at 1 per K steps regardless of admission churn
    (the tunnel's ~130ms/RPC makes dispatch count the binding resource —
    CLAUDE.md);
  - per-row step indices: `t`, the maskgit reveal budget, and the
    finalize (noise-removal) branch are all gathered per row, so rows at
    different denoise stages share each forward batch;
  - per-row noise is a pure function of (request seed, row step):
    admission timing and co-tenant rows CANNOT change a request's
    tokens (the same determinism contract the AR batcher got in round 3)
    — tested by token-identity between solo and staggered runs;
  - rows are independent in the forward (full self-attention per row),
    so a row's trajectory is identical to a solo whole-batch run with
    the same seed.

Parity: in `inject_noise` mode the chunk consumes the same pre-drawn
noise arrays as sampling/sampler.py's harness, and a lockstep rolling
run is asserted token-for-token equal to `build_sampler` (maskgit path;
reference math model_eval.py:3045-3114) in tests/test_rolling.py.

Restrictions: predictor must be "maskgit" (the serving default;
nucleus/first-hitting rows would add per-row top-p state), and CFG
follows config.sampling.cfg as in the static sampler.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization
from unidisc_tpu.sampling.sampler import (adaptive_schedule,
                                          confidence_threshold,
                                          guidance_weight)


class RollingState(NamedTuple):
    x: jax.Array          # (S, L) int32 current tokens
    x0: jax.Array         # (S, L) int32 conditioning tokens
    unmask: jax.Array     # (S, L) bool  conditioning positions
    modality: jax.Array   # (S, L) int32
    schedule: jax.Array   # (S, max_steps) int32 per-row reveal budget
    step: jax.Array       # (S,) int32: 0..row_steps-1 denoise,
    #                       row_steps = finalize, row_steps+extra = done
    row_steps: jax.Array  # (S,) int32 per-REQUEST denoise step count —
    #                       8-NFE fast rows and 32-step rows share a batch
    seed: jax.Array       # (S,) int32 request seed
    active: jax.Array     # (S,) bool


def adaptive_schedule_ragged(num_masked: jax.Array, steps_v: jax.Array,
                             max_steps: int, mode: str) -> jax.Array:
    """Per-row unmasking schedule with PER-ROW step counts (traced),
    padded to (B, max_steps). Exactly adaptive_schedule (sampler.py,
    reference adap_sche model_eval.py:2964-3001) for uniform rows —
    asserted by test_rolling.py's lockstep parity."""
    i = jnp.arange(max_steps)[None, :]
    act = i < steps_v[:, None]
    denom = jnp.maximum(steps_v - 1, 1)[:, None].astype(jnp.float32)
    r = jnp.clip(1.0 - i.astype(jnp.float32) / denom, 0.0, 1.0)
    if mode == "root":
        val = 1 - jnp.sqrt(r)
    elif mode == "linear":
        val = 1 - r
    elif mode == "square":
        val = 1 - r ** 2
    elif mode == "cosine":
        val = jnp.cos(r * jnp.pi * 0.5)
    elif mode == "arccos":
        val = jnp.arccos(r) / (jnp.pi * 0.5)
    else:
        raise ValueError(mode)
    val = jnp.where(act, val, 0.0)
    # steps_v==1 rows: every mode gives val==0 (r==1) — guard the 0/0;
    # the sche==0 -> 1 floor plus the last-slot remainder then put the
    # whole budget on the single step, which is the right schedule
    frac = val / jnp.maximum(val.sum(-1, keepdims=True), 1e-9)
    nm = num_masked[:, None].astype(jnp.float32)
    sche = jnp.round(frac * nm)
    sche = jnp.where(act & (sche == 0), 1.0, sche)
    last_idx = steps_v - 1
    is_last = i == last_idx[:, None]
    sum_except_last = (sche * act).sum(-1) - \
        jnp.take_along_axis(sche, last_idx[:, None], 1)[:, 0]
    last = jnp.maximum(num_masked.astype(jnp.float32) - sum_except_last,
                       0.0)
    sche = jnp.where(is_last, last[:, None], sche)
    return jnp.where(act, sche, 0.0).astype(jnp.int32)


def build_rolling_sampler(forward_logits: Callable, config: Config, *,
                          slots: int, num_steps: Optional[int] = None,
                          chunk: int = 8, inject_noise: bool = False):
    """Compile the rolling-batch state machine.

    forward_logits(params, x, sigma, modality) -> (B, L, V) raw logits —
    the same closure contract as build_sampler.

    Returns an object with:
      init_state() -> RollingState
      insert_many(state, slots_v, x0, unmask, modality, seeds) -> state
        (jitted; slots_v entries >= slots are padding, dropped on device)
      step_chunk(params, state[, injected]) -> state  (jitted; `chunk`
        denoise iterations in one program)
      done_at: step value at which a row is finished
    """
    cfg = config.sampling
    mcfg = config.model
    if cfg.predictor != "maskgit":
        raise ValueError(
            f"rolling batching supports predictor='maskgit' "
            f"(got {cfg.predictor!r})")
    if cfg.cfg == -1:
        # the cfg==-1 sweep maps guidance weight to BATCH ROW INDEX
        # (linspace over rows) — under rolling admission a request's row
        # is an accident of slot assignment, which would break the
        # determinism contract (tokens independent of co-tenancy)
        raise ValueError("sampling.cfg == -1 (the per-row CFG sweep) is "
                         "incompatible with rolling batching — use the "
                         "whole-batch sampler for sweeps")
    noise = get_noise(config.noise)
    steps = num_steps or cfg.steps    # per-row MAXIMUM (and the default)
    mask_index = mcfg.mask_index
    eps = cfg.sampling_eps
    L = mcfg.length
    S = slots
    use_cfg = cfg.cfg is not None
    extra = 1 if cfg.noise_removal else 0
    done_at = steps + extra           # max over rows; per-row is
    #                                   row_steps + extra
    modal_kw = dict(text_vocab_size=mcfg.text_vocab_size) \
        if mcfg.force_argmax_valid_indices else None

    def _forward(params, x, t, x0, x0_unmask, modality):
        """Unnormalized masked log-p with CFG (per-row t), mirroring
        build_sampler's ddpm_forward (reference model_eval.py:1761-1833);
        normalization is skipped — Gumbel-argmax is shift-invariant and
        confidences use an explicit logsumexp."""
        sigma_t = noise.total(t)
        mk = dict(modality=modality, **modal_kw) \
            if (modal_kw is not None and modality is not None) else {}
        if use_cfg:
            x_uncond = jnp.where(x0_unmask, mask_index, x)
            xx = jnp.concatenate([x, x_uncond], axis=0)
            ss = jnp.concatenate([sigma_t, sigma_t], axis=0)
            mm = None if modality is None else \
                jnp.concatenate([modality, modality], axis=0)
            logits = forward_logits(params, xx, ss, mm)
            logit_c, logit_u = jnp.split(logits, 2, axis=0)
            w = guidance_weight(cfg, t)[:, None, None]
            combined = (1 + w) * logit_c - w * logit_u
            return subs_parameterization(combined, None, mask_index,
                                         normalize=False, **mk)
        logits = forward_logits(params, x, sigma_t, modality)
        return subs_parameterization(logits, x, mask_index,
                                     normalize=False, **mk)

    def init_state() -> RollingState:
        z = lambda *s: jnp.zeros(s, jnp.int32)
        return RollingState(
            x=jnp.full((S, L), mask_index, jnp.int32), x0=z(S, L),
            unmask=jnp.zeros((S, L), bool), modality=z(S, L),
            schedule=z(S, steps), step=jnp.full((S,), done_at, jnp.int32),
            row_steps=jnp.full((S,), steps, jnp.int32),
            seed=z(S), active=jnp.zeros((S,), bool))

    def insert_many(state: RollingState, slots_v, x0, unmask, modality,
                    seeds, steps_v=None) -> RollingState:
        """Scatter N new requests into their slots (slot >= S = padding,
        dropped device-side via scatter mode='drop' so admission groups
        can be bucketed; -1 would WRAP to S-1 in JAX, so the sentinel
        must be out-of-range high). steps_v: per-request denoise step
        counts <= max steps (default: max) — fast low-NFE requests and
        full-step requests share the batch."""
        n = slots_v.shape[0]
        if steps_v is None:
            steps_v = jnp.full((n,), steps, jnp.int32)
        x_init = jnp.where(unmask, x0, mask_index)
        sche = adaptive_schedule_ragged(
            (x_init == mask_index).sum(-1), steps_v, steps,
            cfg.maskgit_mode)
        put = lambda arr, val: arr.at[slots_v].set(val, mode="drop")
        return RollingState(
            x=put(state.x, x_init), x0=put(state.x0, x0),
            unmask=put(state.unmask, unmask),
            modality=put(state.modality, modality),
            schedule=put(state.schedule, sche),
            step=put(state.step, jnp.zeros((n,), jnp.int32)),
            row_steps=put(state.row_steps, steps_v.astype(jnp.int32)),
            seed=put(state.seed, seeds.astype(jnp.int32)),
            active=put(state.active, jnp.ones((n,), bool)))

    def _row_keys(seed, step):
        """Noise key = f(request seed, row step): reproducible under any
        admission timing / co-tenancy."""
        k = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        return jax.random.fold_in(k, step)

    def _body(params, s: RollingState, injected=None) -> RollingState:
        rs = s.row_steps
        denoise = s.active & (s.step < rs)
        # noise-removal branch only exists when configured; without it a
        # row at step==rs is DONE and must freeze, not finalize
        final = (s.active & (s.step == rs)) if extra else \
            jnp.zeros_like(denoise)
        step_c = jnp.clip(s.step, 0, rs - 1)
        # static-sampler parity: timesteps[i] = 1 - i*(1-eps)/steps
        # (linspace(1.0, eps, steps+1)), with per-row step counts
        t_lin = 1.0 - step_c.astype(jnp.float32) * (1.0 - eps) / \
            jnp.maximum(rs, 1).astype(jnp.float32)
        t = jnp.where(s.step >= rs, eps, t_lin)

        raw = _forward(params, s.x, t, s.x0, s.unmask, s.modality)
        V = raw.shape[-1]

        if inject_noise:
            gi = jnp.clip(s.step, 0, steps - 1)
            exp_n = jnp.take_along_axis(
                injected["exp"], gi[None, :, None, None], axis=0)[0]
            gum_n = jnp.take_along_axis(
                injected["gumbel"], gi[None, :, None], axis=0)[0]
            pred = jnp.argmax(raw - jnp.log(exp_n), axis=-1)
        else:
            keys = jax.vmap(_row_keys)(s.seed, s.step)
            g_tok = jax.vmap(lambda k: jax.random.gumbel(
                jax.random.fold_in(k, 1), (L, V), raw.dtype))(keys)
            gum_n = jax.vmap(lambda k: jax.random.gumbel(
                jax.random.fold_in(k, 2), (L,)))(keys)
            pred = jnp.argmax(raw + g_tok, axis=-1)

        copy = s.x != mask_index
        lse = jax.nn.logsumexp(raw, axis=-1)
        conf = jnp.take_along_axis(raw, pred[..., None],
                                   axis=-1).squeeze(-1) - lse
        conf = jnp.maximum(conf, jnp.log(1e-30))
        conf = conf + cfg.maskgit_r_temp * gum_n * t[:, None]
        conf = jnp.where(copy, -jnp.inf, conf)
        num_unmask = jnp.take_along_axis(s.schedule, step_c[:, None],
                                         axis=1)[:, 0]
        num_unmask = jnp.minimum(num_unmask, (~copy).sum(-1))
        thresh = confidence_threshold(conf, num_unmask)
        x_mg = jnp.where(conf >= thresh, pred, s.x)

        # noise removal: rows at step==steps argmax their remaining masks
        x_fin = jnp.where(s.x == mask_index, jnp.argmax(raw, -1), s.x)

        x_next = jnp.where(denoise[:, None], x_mg,
                           jnp.where(final[:, None], x_fin, s.x))
        x_next = jnp.where(s.unmask, s.x0, x_next)
        step_next = jnp.where(s.active,
                              jnp.minimum(s.step + 1, rs + extra), s.step)
        return s._replace(x=x_next, step=step_next)

    def step_chunk(params, state: RollingState,
                   injected=None) -> RollingState:
        assert (injected is not None) == inject_noise

        def body(s, _):
            return _body(params, s, injected), None

        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    class _Built(NamedTuple):
        init_state: Callable
        insert_many: Callable
        step_chunk: Callable
        done_at: int      # max over rows; a row finishes at its own
        steps: int        # row_steps + extra
        chunk: int
        extra: int        # 1 when noise_removal adds a finalize step

    return _Built(init_state, jax.jit(insert_many), jax.jit(step_chunk),
                  done_at, steps, chunk, extra)


def build_rolling_t2i(model, config: Config, *, slots: int,
                      num_steps: Optional[int] = None, chunk: int = 8,
                      inject_noise: bool = False):
    """Rolling batching on the SPAN-FACTORED t2i path: the per-chunk
    forward runs the trunk + image-span x image-vocab head
    (sampling/t2i_fast.py — 4.4x fewer logit elements at the production
    layout, pre-matmul CFG combine), cutting the rolling batcher's main
    cost vs the generic full-head forward. Text is fully conditioned by
    construction; rows carry per-request step counts like the generic
    rolling sampler.

    Lockstep parity with build_t2i_sampler(inject_noise=True) is
    asserted token-for-token in tests/test_rolling.py."""
    from unidisc_tpu.sampling.t2i_fast import img_log_weights_fn

    cfg = config
    m = cfg.model
    s = cfg.sampling
    if s.predictor != "maskgit":
        raise ValueError("rolling t2i supports predictor='maskgit'")
    if s.maskgit_dilation and s.maskgit_dilation > 1:
        raise ValueError("rolling t2i does not schedule dilated groups; "
                         "use per-request low step counts instead "
                         "(the 303M A/B's few-step robustness result)")
    steps = num_steps or s.steps
    Lt, Li, L = m.txt_length, m.img_length, m.length
    v0 = m.text_vocab_size
    mask_index = m.mask_index
    eps = s.sampling_eps
    S = slots
    extra = 1  # t2i noise removal is a cond, folded into the last step
    done_at = steps + extra
    log_w = img_log_weights_fn(model, cfg)

    def init_state() -> RollingState:
        z = lambda *sh: jnp.zeros(sh, jnp.int32)
        return RollingState(
            x=jnp.full((S, L), mask_index, jnp.int32), x0=z(S, L),
            unmask=jnp.zeros((S, L), bool), modality=z(S, L),
            schedule=z(S, steps), step=jnp.full((S,), done_at, jnp.int32),
            row_steps=jnp.full((S,), steps, jnp.int32),
            seed=z(S), active=jnp.zeros((S,), bool))

    modality_row = jnp.concatenate(
        [jnp.zeros((Lt,), jnp.int32), jnp.ones((Li,), jnp.int32)])

    def insert_many(state: RollingState, slots_v, txt, seeds,
                    steps_v=None) -> RollingState:
        n = slots_v.shape[0]
        if steps_v is None:
            steps_v = jnp.full((n,), steps, jnp.int32)
        x_init = jnp.concatenate(
            [txt, jnp.full((n, Li), mask_index, jnp.int32)], -1)
        sche = adaptive_schedule_ragged(
            jnp.full((n,), Li), steps_v, steps, s.maskgit_mode)
        put = lambda arr, val: arr.at[slots_v].set(val, mode="drop")
        return state._replace(
            x=put(state.x, x_init),
            schedule=put(state.schedule, sche),
            step=put(state.step, jnp.zeros((n,), jnp.int32)),
            row_steps=put(state.row_steps, steps_v.astype(jnp.int32)),
            seed=put(state.seed, seeds.astype(jnp.int32)),
            active=put(state.active, jnp.ones((n,), bool)))

    def _row_keys(seed, step):
        k = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        return jax.random.fold_in(k, step)

    def _body(params, st: RollingState, injected=None) -> RollingState:
        rs = st.row_steps
        denoise = st.active & (st.step < rs)
        final = st.active & (st.step == rs)
        step_c = jnp.clip(st.step, 0, rs - 1)
        t_lin = 1.0 - step_c.astype(jnp.float32) * (1.0 - eps) / \
            jnp.maximum(rs, 1).astype(jnp.float32)
        t = jnp.where(st.step >= rs, eps, t_lin)

        modality = jnp.broadcast_to(modality_row[None], (S, L))
        raw = log_w(params, st.x, t, modality)     # (S, Li, img_vocab)

        if inject_noise:
            gi = jnp.clip(st.step, 0, steps - 1)
            g_tok = jnp.take_along_axis(
                injected["gumbel_tok"], gi[None, :, None, None],
                axis=0)[0].astype(raw.dtype)
            g_conf = jnp.take_along_axis(
                injected["gumbel_conf"], gi[None, :, None], axis=0)[0]
        else:
            keys = jax.vmap(_row_keys)(st.seed, st.step)
            g_tok = jax.vmap(lambda k: jax.random.gumbel(
                jax.random.fold_in(k, 1), raw.shape[1:], raw.dtype))(keys)
            g_conf = jax.vmap(lambda k: jax.random.gumbel(
                jax.random.fold_in(k, 2), (Li,)))(keys)

        pred_local = jnp.argmax(raw + g_tok, axis=-1)
        lse = jax.nn.logsumexp(raw, axis=-1)
        conf = jnp.take_along_axis(raw, pred_local[..., None],
                                   -1).squeeze(-1) - lse
        img = st.x[:, Lt:]
        copy = img != mask_index
        eligible = ~copy
        num = jnp.take_along_axis(st.schedule, step_c[:, None], 1)[:, 0]
        num = jnp.minimum(num, eligible.sum(-1))
        conf = conf + s.maskgit_r_temp * g_conf * t[:, None]
        conf = jnp.where(eligible, conf, -jnp.inf)
        thresh = confidence_threshold(conf, num)
        img_mg = jnp.where((conf >= thresh) & eligible,
                           pred_local + v0, img)
        img_fin = jnp.where(img == mask_index,
                            jnp.argmax(raw, -1) + v0, img)
        img_next = jnp.where(denoise[:, None], img_mg,
                             jnp.where(final[:, None], img_fin, img))
        x_next = st.x.at[:, Lt:].set(img_next)
        step_next = jnp.where(st.active,
                              jnp.minimum(st.step + 1, rs + extra),
                              st.step)
        return st._replace(x=x_next, step=step_next)

    def step_chunk(params, state: RollingState,
                   injected=None) -> RollingState:
        assert (injected is not None) == inject_noise

        def body(st, _):
            return _body(params, st, injected), None

        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    class _BuiltT2I(NamedTuple):
        init_state: Callable
        insert_many: Callable
        step_chunk: Callable
        done_at: int
        steps: int
        chunk: int
        extra: int

    return _BuiltT2I(init_state, jax.jit(insert_many), jax.jit(step_chunk),
                     done_at, steps, chunk, extra)


def _bucket(n: int, cap: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, cap)


class RollingDiffusionBatcher:
    """Threaded front end: submit() returns a Future of the (L,) token
    row; a worker admits pending requests into free slots (bucketed,
    padded with slot=S dropped rows — ONE device dispatch per admission
    group) and advances the whole batch `chunk` denoise steps per
    dispatch.

    Robustness contract: a device error in the worker fails every
    owned and queued future (set_exception) and re-initializes the
    device state, so callers never hang on a dead worker; shutdown()
    likewise fails outstanding futures. Optional `dispatch_lock`
    serializes device dispatch with other engine routes (the v5e's
    16GB HBM cannot host two large programs — CLAUDE.md)."""

    def __init__(self, forward_logits, params, config: Config, *,
                 slots: int = 8, chunk: int = 8,
                 num_steps: Optional[int] = None, dispatch_lock=None):
        self.built = build_rolling_sampler(forward_logits, config,
                                           slots=slots, chunk=chunk,
                                           num_steps=num_steps)
        self.params = params
        self.slots = slots
        self.L = config.model.length
        self._start(dispatch_lock)

    # shared front-end machinery (also used by RollingT2IBatcher)
    def _start(self, dispatch_lock):
        self.state = self.built.init_state()
        self._pending: "queue.Queue" = queue.Queue()
        self._submit_lock = threading.Lock()
        self._owner = [None] * self.slots  # slot -> Future | None
        # host-side mirror of state.step: the device update is
        # deterministic (min(step + chunk, row done) per dispatched
        # chunk), so harvest needs NO device sync to know who finished
        # — on the tunneled chip (~130ms/RPC) per-chunk syncs dominated
        # the measured serving latency
        self._steps = [self.built.done_at] * self.slots
        # per-slot finish line: row_steps + extra (requests may carry
        # their own step count — 8-NFE fast rows share the batch)
        self._done = [self.built.done_at] * self.slots
        self._dispatch_lock = dispatch_lock or threading.Lock()
        self._stop = False
        self._wake = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _check_steps(self, steps: Optional[int]) -> int:
        steps = self.built.steps if steps is None else int(steps)
        if not 1 <= steps <= self.built.steps:
            raise ValueError(
                f"steps={steps} outside [1, {self.built.steps}]")
        return steps

    def warmup(self):
        """Pre-compile every admission bucket + the chunk program on a
        throwaway state (compiles are ~1s each over a tunneled chip;
        without this they land inside the first requests' latency).
        Uses the SAME insert signature as _admit (incl. steps_v) so the
        warmed traces are the ones live admissions hit. Holds the
        dispatch lock — the worker may already be serving, and two
        device programs sharing the chip OOM its HBM (CLAUDE.md)."""
        with self._dispatch_lock:
            st = self.built.init_state()
            b = 1
            warmed = set()
            while b <= self.slots:
                st = self._warm_insert(st, b)
                warmed.add(b)
                b *= 2
            # _bucket caps at slots, so a non-power-of-two slot count is
            # itself a reachable admission bucket
            if self.slots not in warmed:
                st = self._warm_insert(st, self.slots)
            st = self.built.step_chunk(self.params, st)
            np.asarray(st.x)  # also warms the harvest transfer path

    def _warm_insert(self, st, b):
        pad = jnp.full((b,), self.slots, jnp.int32)  # all-dropped
        L = self.L
        return self.built.insert_many(
            st, pad, jnp.zeros((b, L), jnp.int32),
            jnp.zeros((b, L), bool), jnp.zeros((b, L), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), self.built.steps, jnp.int32))

    def submit(self, x0: np.ndarray, unmask: np.ndarray,
               modality: Optional[np.ndarray] = None,
               seed: int = 0, steps: Optional[int] = None) -> "Future":
        """steps: per-request denoise step count <= the batcher's max
        (e.g. 8 for a fast_nfe-style request sharing a 32-step batch)."""
        fut: Future = Future()
        if modality is None:
            modality = np.zeros((self.L,), np.int32)
        steps = self._check_steps(steps)
        self._enqueue(((np.asarray(x0, np.int32),
                        np.asarray(unmask, bool),
                        np.asarray(modality, np.int32)), int(seed),
                       steps, fut))
        return fut

    def _enqueue(self, item):
        # the stop check and the put share a lock with shutdown's drain,
        # or a submit racing shutdown could enqueue AFTER the final
        # drain and its future would never resolve
        with self._submit_lock:
            if self._stop:
                raise RuntimeError("batcher is shut down")
            self._pending.put(item)
        self._wake.set()

    def shutdown(self):
        with self._submit_lock:
            self._stop = True
        self._wake.set()
        self._thread.join(timeout=30)
        exc = RuntimeError("batcher shut down")
        self._fail_outstanding(exc)
        # fail anything still queued (no worker will consume it)
        while True:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                break
            fut = item[-1]
            if not fut.done():
                fut.set_exception(exc)

    def _fail_outstanding(self, exc):
        for i, fut in enumerate(self._owner):
            if fut is not None:
                self._owner[i] = None
                if not fut.done():
                    fut.set_exception(exc)
        while True:
            try:
                item = self._pending.get_nowait()
            except queue.Empty:
                break
            fut = item[-1]
            if not fut.done():
                fut.set_exception(exc)

    # ------------------------------------------------------------------
    def _take_group(self):
        free = [i for i, o in enumerate(self._owner) if o is None]
        group = []
        while free and not self._pending.empty():
            try:
                group.append(self._pending.get_nowait())
            except queue.Empty:
                break
            if len(group) == len(free):
                break
        return free, group

    def _admit(self):
        free, group = self._take_group()
        if not group:
            return False
        n = _bucket(len(group), self.slots)
        slots_v = np.full((n,), self.slots, np.int32)  # S = dropped pad
        rows = self._empty_rows(n)
        seeds = np.zeros((n,), np.int32)
        steps_v = np.full((n,), self.built.steps, np.int32)
        for j, (row, seed, stp, fut) in enumerate(group):
            slot = free[j]
            slots_v[j] = slot
            self._fill_row(rows, j, row)
            seeds[j], steps_v[j] = seed, stp
            self._owner[slot] = fut
            self._steps[slot] = 0
            self._done[slot] = stp + self.built.extra
        self.state = self._dispatch_insert(slots_v, rows, seeds, steps_v)
        return True

    # per-mode row packing hooks -----------------------------------------
    def _empty_rows(self, n):
        return (np.zeros((n, self.L), np.int32),
                np.zeros((n, self.L), bool),
                np.zeros((n, self.L), np.int32))

    def _fill_row(self, rows, j, row):
        rows[0][j], rows[1][j], rows[2][j] = row

    def _dispatch_insert(self, slots_v, rows, seeds, steps_v):
        x0, unmask, modality = rows
        return self.built.insert_many(
            self.state, jnp.asarray(slots_v), jnp.asarray(x0),
            jnp.asarray(unmask), jnp.asarray(modality),
            jnp.asarray(seeds), jnp.asarray(steps_v))

    # --------------------------------------------------------------------
    def _harvest(self):
        # the host step mirror decides who is done — no step-vector sync
        # per chunk. The transfer is the WHOLE (S, L) token array (a few
        # KB): a fixed shape, so no per-done-set gather programs get
        # compiled (each distinct shape is a ~1s remote compile on the
        # tunneled chip — measured dominating the first A/B run)
        done = [i for i, o in enumerate(self._owner)
                if o is not None and self._steps[i] >= self._done[i]]
        if not done:
            return
        rows = np.asarray(self.state.x)
        for i in done:
            fut, self._owner[i] = self._owner[i], None
            if not fut.done():
                fut.set_result(rows[i])

    def _worker(self):
        while not self._stop:
            try:
                with self._dispatch_lock:
                    admitted = self._admit()
                busy = any(o is not None for o in self._owner)
                if not busy and not admitted:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                with self._dispatch_lock:
                    self.state = self.built.step_chunk(self.params,
                                                       self.state)
                for i, o in enumerate(self._owner):
                    if o is not None:
                        self._steps[i] = min(
                            self._steps[i] + self.built.chunk,
                            self._done[i])
                with self._dispatch_lock:
                    self._harvest()
            except Exception as e:  # noqa: BLE001 — device/tunnel errors
                # fail everyone loudly and reset: callers must never
                # hang on a dead worker (tunnel stalls and HBM OOM are
                # routine here — CLAUDE.md)
                self._fail_outstanding(e)
                self._steps = [self.built.done_at] * self.slots
                self._done = [self.built.done_at] * self.slots
                try:
                    self.state = self.built.init_state()
                except Exception:  # noqa: BLE001
                    self._stop = True
                    return


class RollingT2IBatcher(RollingDiffusionBatcher):
    """Rolling front end on the SPAN-FACTORED t2i path
    (build_rolling_t2i): submit() takes the text prompt row; the
    per-chunk forward computes image-span x image-vocab logits only
    (4.4x fewer logit elements at the production layout). Shares the
    whole worker/harvest/robustness machinery with the base class —
    only the build step and the row-packing hooks differ."""

    def __init__(self, model, params, config: Config, *, slots: int = 8,
                 chunk: int = 8, num_steps: Optional[int] = None,
                 dispatch_lock=None):
        self.built = build_rolling_t2i(model, config, slots=slots,
                                       chunk=chunk, num_steps=num_steps)
        self.params = params
        self.slots = slots
        self.L = config.model.length
        self.Lt = config.model.txt_length
        self._start(dispatch_lock)

    def _warm_insert(self, st, b):
        pad = jnp.full((b,), self.slots, jnp.int32)
        return self.built.insert_many(
            st, pad, jnp.zeros((b, self.Lt), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), self.built.steps, jnp.int32))

    def submit(self, txt: np.ndarray, seed: int = 0,
               steps: Optional[int] = None) -> "Future":
        fut: Future = Future()
        steps = self._check_steps(steps)
        self._enqueue((np.asarray(txt, np.int32), int(seed), steps, fut))
        return fut

    def _empty_rows(self, n):
        return np.zeros((n, self.Lt), np.int32)

    def _fill_row(self, rows, j, row):
        rows[j] = row

    def _dispatch_insert(self, slots_v, rows, seeds, steps_v):
        return self.built.insert_many(
            self.state, jnp.asarray(slots_v), jnp.asarray(rows),
            jnp.asarray(seeds), jnp.asarray(steps_v))
