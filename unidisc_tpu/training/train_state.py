"""Train state, optimizer, and the single jitted SPMD train step.

TPU-native replacement for the reference's hand-written Accelerate loop body
(reference: model.py:1304-1670 train(): accumulate -> fwd -> bwd -> clip ->
step -> LR -> EMA) and optimizer setup (reference: model_setup.py:385-433
configure_optimizers, AdamW). The whole step — t-sampling, corruption,
forward, NELBO, backward, AdamW, EMA — is ONE jitted XLA program over the
device mesh; XLA inserts all gradient collectives from the sharding
annotations (no NCCL hooks, no GradientAccumulationPlugin).

Gradient accumulation is unnecessary on TPU in this design (the reference
also forces accum==1 on XLA, model.py:1330); scale via the mesh instead.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.forward_process import q_xt, sample_t
from unidisc_tpu.diffusion.loss import LossOutput, ar_loss, diffusion_loss
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization
from unidisc_tpu.parallel.mesh import (batch_sharding, logits_constraint,
                                       params_shardings, replicated)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any


class StepMetrics(NamedTuple):
    loss: jax.Array
    txt_loss: jax.Array
    img_loss: jax.Array
    nll_sum: jax.Array      # sum of std-weighted per-token NLL
    token_count: jax.Array  # valid tokens (metrics denominator)
    grad_norm: jax.Array
    # per-modality NLL sums/counts for BPD/PPL metric collections
    # (reference: model_setup.py:209-227 txt/img metric clones)
    nll_txt_sum: jax.Array
    txt_count: jax.Array
    nll_img_sum: jax.Array
    img_count: jax.Array


def _split_metrics(out: LossOutput, modality, loss, grad_norm) -> StepMetrics:
    mask = out.token_mask
    if modality is None:
        txt_mask = mask
        img_mask = jnp.zeros_like(mask)
    else:
        if modality.shape[-1] != mask.shape[-1]:
            # AR shift drops the first position
            modality = modality[..., -mask.shape[-1]:]
        txt_mask = mask & (modality == 0)
        img_mask = mask & (modality == 1)
    return StepMetrics(
        loss=loss, txt_loss=out.txt_loss, img_loss=out.img_loss,
        nll_sum=(out.nlls * mask).sum(), token_count=mask.sum(),
        grad_norm=grad_norm,
        nll_txt_sum=(out.nlls * txt_mask).sum(), txt_count=txt_mask.sum(),
        nll_img_sum=(out.nlls * img_mask).sum(), img_count=img_mask.sum())


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def make_lr_schedule(config: Config):
    """The reference's schedule zoo (configs/lr_scheduler/*.yaml):
    constant_warmup, cosine_decay (get_cosine_schedule_with_warmup),
    constant_warmup_cosine_decay (timm CosineDecayWarmupLRScheduler with
    warmup_prefix + lr_min floor), cosine_hard_restarts
    (get_cosine_with_hard_restarts_schedule_with_warmup, num_cycles)."""
    t = config.trainer
    if t.scale_lr_by_batch_size:
        # linear batch-size LR scaling against the 512 production batch
        # (reference main.py:320-322)
        import dataclasses as _dc
        t = _dc.replace(t, lr=t.lr * t.global_batch_size / 512)
    total = max(t.max_steps, t.warmup_steps + 1)
    warmup = optax.linear_schedule(t.warmup_lr_init, t.lr, t.warmup_steps)
    if t.lr_schedule == "constant_warmup":
        return optax.join_schedules(
            [warmup, optax.constant_schedule(t.lr)], [t.warmup_steps])
    if t.lr_schedule == "cosine_decay":
        return optax.warmup_cosine_decay_schedule(
            t.warmup_lr_init, t.lr, t.warmup_steps, total)
    if t.lr_schedule == "constant_warmup_cosine_decay":
        return optax.join_schedules(
            [warmup,
             optax.cosine_decay_schedule(
                 t.lr, max(total - t.warmup_steps, 1),
                 alpha=t.lr_min / t.lr)],
            [t.warmup_steps])
    if t.lr_schedule == "cosine_hard_restarts":
        # HF formula: after warmup, lr = peak * 0.5 * (1 + cos(pi *
        # ((num_cycles * progress) % 1))) — each cycle decays to 0 then
        # restarts at peak; 0 past the end of training.
        decay_len = max(total - t.warmup_steps, 1)

        def restarts(step):
            progress = step / decay_len
            phase = (t.num_cycles * jnp.minimum(progress, 1.0)) % 1.0
            return t.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * phase)) \
                * (progress < 1.0)

        return optax.join_schedules([warmup, restarts], [t.warmup_steps])
    raise ValueError(t.lr_schedule)


def make_optimizer(config: Config) -> optax.GradientTransformation:
    """Optimizer + global-norm clipping (reference: model_setup.py:385-433
    configure_optimizers — AdamW default, Adafactor option; clip
    reference: model.py:1518)."""
    t = config.trainer
    if t.optimizer == "adafactor":
        opt = optax.adafactor(make_lr_schedule(config),
                              weight_decay_rate=t.weight_decay or None)
    elif t.optimizer == "lion":
        opt = optax.lion(make_lr_schedule(config), b1=t.beta1, b2=t.beta2,
                         weight_decay=t.weight_decay)
    elif t.optimizer == "muon":
        # Muon for hidden matrices (NS5 orthogonalized momentum — MXU
        # matmuls, cheap on TPU), embedded Adam for everything else;
        # scan-stacked (n_blocks, K, N) kernels batch the NS iteration
        # over axis 0 (training/muon.py). BEYOND the reference zoo.
        from unidisc_tpu.training.muon import muon_dimension_numbers
        opt = optax.contrib.muon(
            make_lr_schedule(config), beta=0.95, nesterov=True,
            weight_decay=t.weight_decay,
            adam_b1=t.beta1, adam_b2=t.beta2,
            muon_weight_dimension_numbers=muon_dimension_numbers)
    elif t.optimizer == "ademamix":
        # reference: trainer.ademamix -> unidisc/utils/ademamix.py AdEMAMix
        # (model_setup.py:400-403); optax.contrib carries the same
        # two-EMA (fast b1 / slow b3, alpha-mixed) update
        opt = optax.contrib.ademamix(
            make_lr_schedule(config), b1=t.beta1, b2=t.beta2,
            eps=t.opt_eps, weight_decay=t.weight_decay)
    else:
        opt = optax.adamw(make_lr_schedule(config), b1=t.beta1, b2=t.beta2,
                          eps=t.opt_eps, weight_decay=t.weight_decay)
    parts = [optax.clip_by_global_norm(t.gradient_clip_val), opt]
    if config.model.mup:
        # MuAdam rule: per-matrix LR *= base_width/width (training/mup.py;
        # reference: mup.MuAdam wrapping, model_setup.py:416-418)
        from unidisc_tpu.training.mup import mup_lr_scale
        parts.append(mup_lr_scale(config))
    return optax.chain(*parts)


def init_train_state(config: Config, params: Any) -> TrainState:
    opt = make_optimizer(config)
    if config.trainer.low_precision_params:
        # bf16 parameters (and therefore bf16 optimizer/EMA state) —
        # halves parameter HBM (reference trainer.low_precision_params,
        # model_setup.py:119/294 keeps the module in self.dtype instead
        # of upcasting to fp32)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16)
            if hasattr(p, "dtype") and jnp.issubdtype(p.dtype,
                                                      jnp.floating) else p,
            params)
    # EMA starts as a *copy* of params (aliased buffers would break jit
    # donation: the same buffer cannot be donated twice). It stays fp32
    # even under low_precision_params: at decay 0.9999 the (1-decay)
    # increment is far below bf16's ~2^-8 relative ulp, so a bf16 EMA
    # accumulator would round back to itself every step and never leave
    # initialization.
    ema = jax.tree_util.tree_map(
        lambda p: jnp.copy(p).astype(jnp.float32)
        if hasattr(p, "dtype") and jnp.issubdtype(p.dtype, jnp.floating)
        else jnp.copy(p), params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt.init(params), ema_params=ema)


# ---------------------------------------------------------------------------
# Loss
# ---------------------------------------------------------------------------

def compute_batch_loss(config: Config, apply_fn, params, rng, batch,
                       mesh=None, train: bool = True,
                       step=None) -> LossOutput:
    """Full forward pass: t-sample -> corrupt -> backbone -> SUBS -> NELBO
    (reference: model.py:797-1173 compute_loss). `batch` is a dict with
    input_ids (B, L) int32, and optionally modality (B, L) and
    attention_mask (B, L)."""
    t_cfg = config.trainer
    m_cfg = config.model
    noise = get_noise(config.noise)

    x0 = batch["input_ids"]
    modality = batch.get("modality")
    attention_mask = batch.get("attention_mask")
    # x_cond: the conditioning-image token stream for img_cond models
    # (reference cond_input_ids, model.py:262-263/399-400)
    extra = {k: batch[k] for k in ("sample_ids", "rope_index", "x_cond")
             if k in batch}
    if m_cfg.img_cond and "x_cond" not in batch:
        # without this, DIT's `x_cond is not None` gate would silently
        # skip the cond trunk and every cross-attention block — the
        # conditioning params would train to nothing with no error
        raise ValueError(
            "model.img_cond=True but the batch has no 'x_cond' stream")
    b = x0.shape[0]

    # MoE (models/moe.py): the training forward also returns the router
    # load-balance auxiliary, added to whichever loss path returns below
    # (eval losses stay pure NELBO/CE — the regularizer is train-only)
    moe_aux = None
    if getattr(m_cfg, "moe_experts", 0) > 0 and train:
        extra["return_moe_aux"] = True

    def add_moe_aux(out):
        if moe_aux is None:
            return out
        return out._replace(
            loss=out.loss + t_cfg.moe_aux_weight * moe_aux)

    rng_t, rng_mask, rng_drop = jax.random.split(rng, 3)

    if t_cfg.add_label and "label" in batch:
        # label-as-token class conditioning (reference: model.py:322-334):
        # the class id + label_shift is written at position 0 and excluded
        # from the loss via the attention mask; q_xt never corrupts it
        # (first_token_dropout re-masks it for label-CFG training)
        label_tok = batch["label"].astype(x0.dtype) + m_cfg.label_shift
        x0 = x0.at[:, 0].set(label_tok)
        if attention_mask is None:
            attention_mask = jnp.ones(x0.shape, dtype=bool)
        attention_mask = attention_mask.at[:, 0].set(False)

    if t_cfg.parameterization == "ar":
        if (t_cfg.ar_inpainting
                or (train and t_cfg.rand_flip_ar_prob is not None)) \
                and "rope_index" not in extra \
                and m_cfg.img_resolutions is None:
            # The backbone's static rope table matches only the canonical
            # [txt|img] layout; row flips and the [corrupted||clean]
            # doubling re-arrange it, so pass explicit per-token
            # within-block rope indices (the DIT rope_index path). The
            # reference's own non-interleaved doubled path is unrunnable
            # as written (the first image block reads NaN-padded rope
            # rows, models/dit.py:1447-1455) — block-restarting positions
            # are the defined behavior here.
            base = jnp.concatenate([
                jnp.arange(m_cfg.txt_length, dtype=jnp.int32),
                jnp.arange(max(m_cfg.img_length, 0), dtype=jnp.int32)])
            extra["rope_index"] = jnp.broadcast_to(
                base[None, :], (b, base.shape[0]))
            if modality is None:
                modality = jnp.zeros_like(x0)
        if train and t_cfg.rand_flip_ar_prob is not None:
            # per-row [txt|img] -> [img|txt] flip so the AR model learns
            # both orderings (reference: model.py:352-370; static
            # non-interleaved layout required there too)
            flip = jax.random.uniform(
                jax.random.fold_in(rng, 13), (b,)) < t_cfg.rand_flip_ar_prob
            tl = m_cfg.txt_length

            def _flip(a):
                return jnp.where(flip[:, None],
                                 jnp.concatenate([a[:, tl:], a[:, :tl]], 1),
                                 a)
            x0 = _flip(x0)
            if modality is not None:
                modality = _flip(modality)
            if attention_mask is not None:
                attention_mask = _flip(attention_mask)
            if "rope_index" in extra:
                extra["rope_index"] = _flip(extra["rope_index"])
        if t_cfg.ar_inpainting:
            # AR inpainting (reference: model.py:880-896): double the
            # sequence to [corrupted || clean]; the corrupted half is
            # masked at an antithetic per-row rate in (0, 1); loss only on
            # the clean half (attention = [zeros || ones], mirroring the
            # reference exactly — it replaces the original padding mask)
            u = jax.random.uniform(rng_t, (b,))
            offset = jnp.arange(b, dtype=jnp.float32) / b
            t_inp = (u / b + offset) % 1.0
            if t_cfg.ar_inpainting_force_val is not None:
                # eval override (reference: eval.ar_inpainting_force_val,
                # model.py:892-893)
                t_inp = jnp.full_like(t_inp, t_cfg.ar_inpainting_force_val)
            x0 = jnp.concatenate([x0, x0], axis=1)
            move = jax.random.uniform(rng_mask, x0.shape) < t_inp[:, None]
            half = x0.shape[1] // 2
            move = move.at[:, half:].set(False)
            x0 = jnp.where(move, m_cfg.mask_index, x0)
            if modality is not None:
                modality = jnp.concatenate([modality, modality], axis=1)
            if "rope_index" in extra:
                extra["rope_index"] = jnp.concatenate(
                    [extra["rope_index"], extra["rope_index"]], axis=1)
            base_mask = attention_mask if attention_mask is not None else \
                jnp.ones((b, half), bool)
            attention_mask = jnp.concatenate(
                [jnp.zeros_like(base_mask), jnp.ones_like(base_mask)],
                axis=1)
        elif train and t_cfg.rand_ar_modality_dropout is not None:
            # mask out the row's FIRST modality entirely with prob p and
            # drop it from attention — the AR analog of CFG-unconditional
            # training (reference: model.py:897-907)
            assert modality is not None
            drop = jax.random.uniform(
                jax.random.fold_in(rng, 17),
                (b,)) < t_cfg.rand_ar_modality_dropout
            first_mod_mask = (modality == modality[:, :1]) & drop[:, None]
            x0 = jnp.where(first_mod_mask, m_cfg.mask_index, x0)
            if attention_mask is None:
                attention_mask = jnp.ones(x0.shape, bool)
            attention_mask = jnp.where(first_mod_mask, False,
                                       attention_mask)
        logits = apply_fn(params, x0, None, modality, rng_drop, train,
                          **extra)
        if "return_moe_aux" in extra:
            logits, moe_aux = logits
        if mesh is not None:
            logits = logits_constraint(logits, mesh)
        # ar_shift: predict token i+1 from prefix <= i (reference: model.py:761-782)
        return add_moe_aux(ar_loss(
            logits[:, :-1], x0[:, 1:], m_cfg.mask_index,
            attention_mask=None if attention_mask is None else attention_mask[:, 1:],
            modality=None if modality is None else modality[:, 1:],
            text_vocab_size=m_cfg.text_vocab_size if m_cfg.force_argmax_valid_indices else None))

    t = sample_t(rng_t, b, antithetic=t_cfg.antithetic_sampling,
                 sampling_eps=t_cfg.sampling_eps,
                 force_timestep=t_cfg.force_timestep)
    if t_cfg.importance_sampling and hasattr(
            noise, "importance_sampling_transformation"):
        # low-variance t distribution (reference: noise_schedule.py:42-46,
        # applied in _sample_t model.py:589-619)
        t = noise.importance_sampling_transformation(t)
    cov_weight = None
    if t_cfg.change_of_variables:
        # change-of-variables objective (reference: model.py:850-857): the
        # backbone is conditioned on t itself, move_chance interpolates in
        # log space, and the loss weight is a constant (set below). Python
        # math on the config-derived scalars so they stay jit-static.
        import math
        f_T = math.log1p(-math.exp(-float(noise.sigma_max)))
        f_0 = math.log1p(-math.exp(-float(noise.sigma_min)))
        move_chance = jnp.exp(f_0 + t * (f_T - f_0))
        sigma = t
        dsigma = noise.rate(t)
    else:
        sigma = noise.total(t)
        dsigma = noise.rate(t)
        move_chance = 1 - jnp.exp(-sigma)
    if t_cfg.change_of_variables or t_cfg.importance_sampling:
        # constant per-token weight log1p(-exp(-sigma_min)) — the
        # t-distribution (importance sampling) or the variable change
        # absorbs the dsigma/expm1 factor (reference: model.py:969-970)
        import math
        cov_weight = math.log1p(-math.exp(-float(noise.sigma_min)))

    corrupted = q_xt(rng_mask, x0, move_chance, m_cfg.mask_index,
                     modality=modality,
                     mask_entire_modality=t_cfg.mask_entire_modality if train else None,
                     multimodal=t_cfg.multimodal_batches,
                     # interleaved batches get per-BLOCK CFG masking
                     # (reference: model.py:483-522)
                     sample_ids=extra.get("sample_ids")
                     if t_cfg.interleaved else None,
                     protect_first=t_cfg.add_label,
                     first_token_dropout=t_cfg.first_token_dropout
                     if train else None,
                     diffusion_mode=t_cfg.discrete_diffusion_mode,
                     text_vocab_size=m_cfg.text_vocab_size
                     if m_cfg.force_argmax_valid_indices else None,
                     vocab_size=m_cfg.vocab_size)

    xt = corrupted.xt
    batch_ignore = corrupted.batch_ignore
    joint_mask = None
    if train and t_cfg.joint_ar_nar_prob is not None:
        # joint AR+NAR: warmed-up fraction of rows stays UNCORRUPTED and
        # takes a per-token AR CE instead of the NELBO (reference:
        # model.py:541-551 q_xt gate + linear_warmup from 1.0)
        p_final = t_cfg.joint_ar_nar_prob
        w = t_cfg.joint_ar_nar_prob_warmup_steps
        if w and step is not None:
            frac = jnp.minimum(step.astype(jnp.float32) / max(1, w), 1.0)
            p_cur = 1.0 + (p_final - 1.0) * frac
        else:
            p_cur = jnp.asarray(p_final, jnp.float32)
        joint_mask = jax.random.uniform(
            jax.random.fold_in(rng, 11), (b,)) < p_cur
        xt = jnp.where(joint_mask[:, None], x0, xt)
        # joint rows are excluded from the NELBO metrics
        # (reference: model.py:1014-1018)
        batch_ignore = batch_ignore | joint_mask

    logits = apply_fn(params, xt, sigma, modality, rng_drop, train,
                      **extra)
    if "return_moe_aux" in extra:
        logits, moe_aux = logits
    if mesh is not None:
        logits = logits_constraint(logits, mesh)

    if t_cfg.parameterization == "sedd":
        # legacy SEDD score-entropy loss (reference: model.py:953,
        # model_utils.py:269-302)
        from unidisc_tpu.diffusion.legacy import (score_entropy,
                                                  sedd_parameterization)
        log_score = sedd_parameterization(logits.astype(jnp.float32),
                                          corrupted.xt, sigma)
        ent = score_entropy(log_score, sigma, corrupted.xt, x0,
                            m_cfg.mask_index)
        loss_tok = dsigma[:, None] * ent
        if attention_mask is None:
            attention_mask = jnp.ones((b, x0.shape[1]), dtype=bool)
        total = (loss_tok * attention_mask).sum() / jnp.maximum(
            attention_mask.sum(), 1)
        return add_moe_aux(LossOutput(
            loss=total, nlls=loss_tok * attention_mask,
            token_mask=attention_mask,
            txt_loss=jnp.zeros((), total.dtype),
            img_loss=jnp.zeros((), total.dtype)))

    if t_cfg.parameterization == "d3pm":
        # discrete-time D3PM loss (reference: model_utils.py:604-636)
        from unidisc_tpu.diffusion.legacy import (d3pm_loss,
                                                  d3pm_parameterization)
        log_p = d3pm_parameterization(logits.astype(jnp.float32))
        loss_tok = d3pm_loss(log_p, corrupted.xt, x0, t, T=1000,
                             mask_index=m_cfg.mask_index)
        if attention_mask is None:
            attention_mask = jnp.ones((b, x0.shape[1]), dtype=bool)
        total = (loss_tok * attention_mask).sum() / jnp.maximum(
            attention_mask.sum(), 1)
        return add_moe_aux(LossOutput(
            loss=total, nlls=loss_tok * attention_mask,
            token_mask=attention_mask,
            txt_loss=jnp.zeros((), total.dtype),
            img_loss=jnp.zeros((), total.dtype)))

    log_p = subs_parameterization(
        logits, xt, m_cfg.mask_index,
        modality=modality if m_cfg.force_argmax_valid_indices else None,
        text_vocab_size=m_cfg.text_vocab_size)

    out = diffusion_loss(
        log_p, x0, sigma, dsigma,
        attention_mask=attention_mask, modality=modality,
        batch_ignore=batch_ignore,
        cov_weight=cov_weight,
        no_ce_weighting=t_cfg.no_ce_weighting,
        softmin_snr=t_cfg.softmin_snr,
        # the joint combine defers/ignores the modality loss weights
        # (reference: model.py:1034-1035)
        text_loss_weight=None if joint_mask is not None
        else t_cfg.text_loss_weight,
        img_loss_weight=None if joint_mask is not None
        else t_cfg.img_loss_weight)

    if joint_mask is not None or t_cfg.ar_llm_loss:
        from unidisc_tpu.diffusion.loss import (ar_llm_token_nll,
                                                nelbo_weighting)
        ar_tok = ar_llm_token_nll(
            logits.astype(jnp.float32), x0, m_cfg.mask_index,
            modality=modality if m_cfg.force_argmax_valid_indices else None,
            text_vocab_size=m_cfg.text_vocab_size)
        attn = attention_mask if attention_mask is not None else \
            jnp.ones(x0.shape, bool)
        if joint_mask is not None:
            # per-row AR/NAR mixing (reference: model.py:1110-1134; the
            # reference's `+ weighted_z_loss` is an undefined name there —
            # implemented as 0, the only runnable reading)
            log_p_theta = jnp.take_along_axis(
                log_p, x0[..., None], axis=-1).squeeze(-1)
            if t_cfg.no_ce_weighting:
                nar_tok = -log_p_theta
            else:
                nar_tok = -log_p_theta * nelbo_weighting(
                    sigma, dsigma, t_cfg.softmin_snr)[:, None]
            ar_w = joint_mask.mean()
            mixed = jnp.where(joint_mask[:, None],
                              ar_tok * ar_w, nar_tok * (1.0 - ar_w))
            loss = (mixed * attn).sum() / jnp.maximum(attn.sum(), 1)
            out = out._replace(loss=loss)
        else:
            # standalone ar_llm_loss: mean CE over MASKED positions
            # (reference: model.py:1078-1108 labels=-1 elsewhere)
            valid = (xt == m_cfg.mask_index) & attn
            ce = (ar_tok * valid).sum() / jnp.maximum(valid.sum(), 1)
            out = out._replace(loss=ce)
    return add_moe_aux(out)


# ---------------------------------------------------------------------------
# Train / eval steps
# ---------------------------------------------------------------------------

def make_apply_fn(config: Config, model):
    """Wrap model.apply into fn(params, x, sigma, modality, rng, train,
    **extra) where extra carries interleaved-batch args (sample_ids,
    rope_index)."""
    def apply_fn(params, x, sigma, modality, rng, train, **extra):
        kwargs = dict(modality=modality, deterministic=not train, **extra)
        rngs = {"dropout": rng} if train else None
        if sigma is None:
            sigma = jnp.zeros((x.shape[0],), jnp.float32)
        return model.apply({"params": params}, x, sigma, rngs=rngs, **kwargs)
    return apply_fn


def make_train_step(config: Config, model, mesh=None, param_map=None):
    """Build the pure train-step fn (state, batch, rng) -> (state, metrics).

    param_map: optional pure fn applied to state.params before the model
    forward — the LoRA hook (training/lora.py lora_param_map: state.params
    is then the rank-r adapter tree and the base weights are a closed-over
    constant; reference peft wrapping, model_setup.py:175-188)."""
    opt = make_optimizer(config)
    apply_fn = make_apply_fn(config, model)
    ema_decay = config.trainer.ema_decay

    accum = config.trainer.grad_accum_steps

    def train_step(state: TrainState, batch, rng):
        from unidisc_tpu.parallel.pipeline import pipeline_parallel
        from unidisc_tpu.parallel.seq_parallel import sequence_parallel
        with sequence_parallel(mesh), \
                pipeline_parallel(mesh, config.mesh.pp_microbatches):
            return _train_step_body(state, batch, rng)

    def _train_step_body(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params, rng, batch):
            if param_map is not None:
                params = param_map(params)
            out = compute_batch_loss(config, apply_fn, params, rng, batch,
                                     mesh=mesh, train=True, step=state.step)
            return out.loss, out

        if accum > 1:
            # lax.scan microbatching: split the batch into `accum` chunks
            # and average grads (replaces the reference's
            # GradientAccumulationPlugin, main.py:664-669; XLA path there
            # forces accum==1 — here it is one compiled program)
            b = batch["input_ids"].shape[0]
            assert b % accum == 0, \
                f"batch {b} not divisible by grad_accum_steps {accum}"
            mb = b // accum
            chunked = jax.tree_util.tree_map(
                lambda x: x[:mb * accum].reshape(accum, mb, *x.shape[1:])
                if hasattr(x, "shape") and x.ndim >= 1 else x, dict(batch))

            def micro(carry, chunk):
                g_acc, l_acc, rng = carry
                rng, k = jax.random.split(rng)
                (loss, out), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, k, chunk)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + loss, rng), out

            g0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, _), outs = jax.lax.scan(
                micro, (g0, jnp.zeros(()), rng), chunked)
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss_sum / accum
            out = LossOutput(
                loss=loss,
                nlls=outs.nlls.reshape(-1, outs.nlls.shape[-1]),
                token_mask=outs.token_mask.reshape(
                    -1, outs.token_mask.shape[-1]),
                txt_loss=outs.txt_loss.mean(), img_loss=outs.img_loss.mean())
        else:
            (loss, out), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, rng, batch)
        updates, new_opt_state = opt.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        # non-finite-loss guard: skip the update entirely on NaN/inf
        # (reference: model.py:1496-1551 non-finite-loss skip)
        ok = jnp.isfinite(loss)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params)
        new_opt_state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o) if hasattr(n, "shape") else n,
            new_opt_state, state.opt_state)
        # EMA of parameters (reference: models/ema.py:10-115; update at
        # model.py:1540-1545)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * ema_decay
            + (p.astype(e.dtype) if hasattr(p, "astype") else p)
            * (1 - ema_decay),
            state.ema_params, new_params)
        metrics = _split_metrics(out, batch.get("modality"), loss,
                                 optax.global_norm(grads))
        return state.replace(step=state.step + 1, params=new_params,
                             opt_state=new_opt_state, ema_params=new_ema), metrics

    return train_step


def make_eval_step(config: Config, model, mesh=None, use_ema: bool = True,
                   param_map=None):
    apply_fn = make_apply_fn(config, model)

    def eval_step(state: TrainState, batch, rng):
        params = state.ema_params if use_ema else state.params
        if param_map is not None:
            params = param_map(params)
        out = compute_batch_loss(config, apply_fn, params, rng, batch,
                                 mesh=mesh, train=False)
        return _split_metrics(out, batch.get("modality"), out.loss,
                              jnp.zeros(()))
    return eval_step


def shard_train_step(train_step, state: TrainState, mesh):
    """jit the train step with mesh shardings: params/opt/EMA FSDP-sharded,
    batch data-sharded, rng replicated. Returns (jitted_fn, sharded_state)."""
    state_shardings = TrainState(
        step=replicated(mesh),
        params=params_shardings(state.params, mesh),
        opt_state=params_shardings(state.opt_state, mesh),
        ema_params=params_shardings(state.params, mesh),
    )
    data_sh = batch_sharding(mesh)

    jitted = jax.jit(
        train_step,
        in_shardings=(state_shardings,
                      None,  # batch: inferred per-leaf (dict) below
                      replicated(mesh)),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,),
    )
    state = jax.device_put(state, state_shardings)
    return jitted, state, data_sh
