"""Scaffold distillation: train a small trunk to imitate the big model.

The scaffold-decoding measurement (BASELINE.md, scripts/scaffold_ab.py)
showed big-early/small-late reaches 97% of big-only accuracy at 26% of
the compute — but its production gate is a small trunk that actually
knows the big model's task. This module closes that gate: it distills a
student DIT against a frozen teacher's denoising posterior
p_teacher(x0 | x_t) so the student can take over the LATE denoise steps
in `sampling/scaffold.py`.

TPU design notes:
- Teacher forward + student forward + KL + AdamW + EMA are ONE jitted
  program; the teacher runs under stop_gradient (its activations are
  never kept for backward, so the memory cost is one extra forward).
- The sampled noise level can be confined to a window
  [sampling_eps, t_max]. Scaffold hands the student only sigmas BELOW
  `sigma_boundary(config, split)` — `distill_t_max(config, split)`
  returns the matching t ceiling so the student's training distribution
  covers exactly the trajectory region it will serve.
- KL is computed in the SUBS-parameterized space (both posteriors share
  the -inf structure at the mask token / invalid-modality vocab, and
  carry-over makes unmasked positions exact deltas on both sides), so
  the sum runs only over masked positions where the divergence is
  finite and informative.

No reference counterpart: the reference (model.py) trains one model per
run and has no distillation path.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.forward_process import q_xt, sample_t
from unidisc_tpu.diffusion.loss import diffusion_loss
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization
from unidisc_tpu.training.train_state import (TrainState, make_apply_fn,
                                              make_optimizer)


class DistillMetrics(NamedTuple):
    loss: jax.Array       # total training loss (kl + hard_weight * nelbo)
    kl: jax.Array         # mean per-masked-token KL(teacher || student)
    hard_loss: jax.Array  # student NELBO vs ground truth (0 if unweighted)
    grad_norm: jax.Array
    masked_count: jax.Array  # masked tokens in the batch (KL denominator)


def distill_t_max(config: Config, split: int,
                  num_steps: Optional[int] = None) -> float:
    """t ceiling matching a scaffold split: sampler timesteps are
    linspace(1, eps, N+1) and the student serves steps [split, N), i.e.
    t <= timesteps[split] (sampling/scaffold.py sigma_boundary is the
    same boundary expressed as a sigma)."""
    import numpy as np
    steps = num_steps or config.sampling.steps
    if split <= 0:
        return 1.0
    if split >= steps:
        return float(config.sampling.sampling_eps)
    timesteps = np.linspace(1.0, config.sampling.sampling_eps, steps + 1)
    return float(timesteps[split])


def sample_t_window(rng: jax.Array, batch_size: int, *,
                    antithetic: bool = True, sampling_eps: float = 1e-3,
                    t_max: Optional[float] = None) -> jax.Array:
    """sample_t squeezed affinely into [sampling_eps, t_max] (the
    scaffold student's late-step noise window)."""
    t = sample_t(rng, batch_size, antithetic=antithetic,
                 sampling_eps=sampling_eps)
    if t_max is None or t_max >= 1.0:
        return t
    return sampling_eps + (t - sampling_eps) * \
        (t_max - sampling_eps) / (1.0 - sampling_eps)


def masked_token_kl(teacher_log_p: jax.Array, student_log_p: jax.Array,
                    move_indices: jax.Array,
                    valid: Optional[jax.Array] = None) -> tuple:
    """Mean KL(p_T || p_S) over masked valid positions.

    Both log-prob tensors are SUBS-parameterized (B, L, V): they carry
    -inf at the mask token and at modality-restricted vocab, and exact
    deltas at unmasked positions. Terms with p_T == 0 are zeroed
    explicitly (p_T log p_T/p_S would otherwise be 0 * (-inf + inf) =
    NaN where both sides are -inf).

    Returns (mean_kl, masked_count)."""
    p_t = jnp.exp(teacher_log_p)
    elem = jnp.where(p_t > 0, p_t * (teacher_log_p - student_log_p), 0.0)
    kl_tok = elem.sum(-1)  # (B, L)
    mask = move_indices
    if valid is not None:
        mask = mask & valid
    count = mask.sum()
    return (kl_tok * mask).sum() / jnp.maximum(count, 1), count


def make_distill_step(config: Config, student_model,
                      teacher_apply: Callable, *,
                      t_max: Optional[float] = None,
                      hard_weight: float = 0.0,
                      guidance: Optional[float] = None,
                      mesh=None) -> Callable:
    """Build the jitted-able distillation step.

    Args:
      config: student Config (model = student trunk; trainer/noise/
        sampling fields drive the optimizer, t distribution, and vocab
        restriction — they must match the teacher's serving config).
      student_model: Flax DIT for the student.
      teacher_apply: (teacher_params, x, sigma, modality) -> logits, the
        same closure shape the samplers take. The teacher is FROZEN —
        gradients are stopped on its output.
      t_max: ceiling of the sampled noise-level window (use
        distill_t_max(config, split) to specialize the student on a
        scaffold split's late-step region). None = full [eps, 1].
      hard_weight: optional weight on the standard NELBO of the student
        against the ground-truth x0 (keeps the student anchored to data
        where the teacher is imperfect).
      guidance: CFG DISTILLATION (guided distillation, the standard
        answer to CFG's 2x serving cost — no reference counterpart; the
        reference pays both forwards every step, model_eval.py:1761-1833).
        When set, the teacher target is the CFG-COMBINED posterior: the
        conditioning modality (modality == 0, text) is clamped VISIBLE in
        x_t (as at sampling time), the teacher runs a batched [cond ||
        re-masked-uncond] forward, and logits combine as
        (1+w)·cond − w·uncond with the serving schedule
        w(t) = guidance_weight(sampling-config-with-cfg=`guidance`, t)
        (sampling/sampler.py:122). The student learns to emit the GUIDED
        posterior in ONE conditional forward, so it samples with
        sampling.cfg=None at half the NFE cost. KL runs over masked
        NON-conditioning positions only.

    Returns step(state, teacher_params, batch, rng) ->
    (state, DistillMetrics); `state` is the student's TrainState
    (init_train_state(config, student_params))."""
    import dataclasses

    t_cfg = config.trainer
    m_cfg = config.model
    noise = get_noise(config.noise)
    opt = make_optimizer(config)
    student_apply = make_apply_fn(config, student_model)
    ema_decay = t_cfg.ema_decay
    ceil = 1.0 if t_max is None else float(t_max)
    floor = float(t_cfg.sampling_eps)
    if guidance is not None:
        from unidisc_tpu.sampling.sampler import guidance_weight
        s_cfg = dataclasses.replace(config.sampling, cfg=float(guidance))

    def step(state: TrainState, teacher_params, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        x0 = batch["input_ids"]
        modality = batch.get("modality")
        attention_mask = batch.get("attention_mask")
        b = x0.shape[0]

        rng_t, rng_mask, rng_drop = jax.random.split(rng, 3)
        t = sample_t_window(rng_t, b,
                            antithetic=t_cfg.antithetic_sampling,
                            sampling_eps=floor, t_max=ceil)
        sigma = noise.total(t)
        dsigma = noise.rate(t)
        move_chance = 1 - jnp.exp(-sigma)
        corrupted = q_xt(rng_mask, x0, move_chance, m_cfg.mask_index,
                         modality=modality)

        restrict = modality if m_cfg.force_argmax_valid_indices else None
        if guidance is not None:
            # conditioning (text) is visible at sampling time: clamp it
            # back to x0 and exclude it from the KL support
            assert modality is not None, "guidance distillation needs modality"
            cond = modality == 0
            xt = jnp.where(cond, x0, corrupted.xt)
            move_indices = corrupted.move_indices & ~cond
            corrupted = corrupted._replace(xt=xt,
                                           move_indices=move_indices)
            # batched [cond || uncond] teacher forward, uncond = the
            # sampler's re-masked conditioning (sampler.py:198)
            x_u = jnp.where(cond, m_cfg.mask_index, xt)
            xx = jnp.concatenate([xt, x_u], axis=0)
            ss = jnp.concatenate([sigma, sigma], axis=0)
            mm = jnp.concatenate([modality, modality], axis=0)
            logits2 = jax.lax.stop_gradient(
                teacher_apply(teacher_params, xx, ss, mm))
            logit_c, logit_u = jnp.split(logits2, 2, axis=0)
            w = guidance_weight(s_cfg, t)[:, None, None]
            teacher_logits = (1 + w) * logit_c - w * logit_u
        else:
            teacher_logits = jax.lax.stop_gradient(
                teacher_apply(teacher_params, corrupted.xt, sigma, modality))
        teacher_log_p = subs_parameterization(
            teacher_logits, corrupted.xt, m_cfg.mask_index,
            modality=restrict, text_vocab_size=m_cfg.text_vocab_size)

        def loss_fn(params):
            logits = student_apply(params, corrupted.xt, sigma, modality,
                                   rng_drop, True)
            log_p = subs_parameterization(
                logits, corrupted.xt, m_cfg.mask_index,
                modality=restrict, text_vocab_size=m_cfg.text_vocab_size)
            kl, count = masked_token_kl(teacher_log_p, log_p,
                                        corrupted.move_indices,
                                        valid=attention_mask)
            hard = jnp.zeros((), kl.dtype)
            if hard_weight:
                hard = diffusion_loss(
                    log_p, x0, sigma, dsigma,
                    attention_mask=attention_mask, modality=modality,
                    softmin_snr=t_cfg.softmin_snr,
                    text_loss_weight=t_cfg.text_loss_weight,
                    img_loss_weight=t_cfg.img_loss_weight).loss
            return kl + hard_weight * hard, (kl, hard, count)

        (loss, (kl, hard, count)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = opt.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        # non-finite guard + EMA, same contract as the train step
        ok = jnp.isfinite(loss)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "shape") else n,
            new_opt_state, state.opt_state)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay + p * (1 - ema_decay),
            state.ema_params, new_params)
        metrics = DistillMetrics(loss=loss, kl=kl, hard_loss=hard,
                                 grad_norm=optax.global_norm(grads),
                                 masked_count=count)
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt_state,
                             ema_params=new_ema), metrics

    return step
