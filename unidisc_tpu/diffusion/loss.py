"""NELBO loss for masked discrete diffusion.

Pure-function redesign of Diffusion.compute_loss (reference: model.py:797-1173):
continuous-time NELBO -log p_theta(x0) * dsigma/expm1(sigma), optional
softmin-SNR weighting, separate text/image loss weighting, and the metrics
surface (per-token NLLs + masks) used by BPD/PPL metrics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.diffusion.subs import subs_parameterization


class LossOutput(NamedTuple):
    loss: jax.Array        # scalar training loss
    nlls: jax.Array        # (B, L) per-token std-weighted NLL (for BPD/PPL)
    token_mask: jax.Array  # (B, L) bool valid-token mask (metrics denominator)
    txt_loss: jax.Array    # scalar (0 if not split)
    img_loss: jax.Array    # scalar (0 if not split)


def nelbo_weighting(sigma: jax.Array, dsigma: jax.Array,
                    softmin_snr: Optional[float] = None) -> jax.Array:
    """Per-sample CE weight. Standard: dsigma/expm1(sigma); softmin-SNR
    (gamma) caps the weight: dsigma/(expm1(sigma) + 1/gamma)
    (reference: model.py:984-993)."""
    if softmin_snr is None:
        return dsigma / jnp.expm1(sigma)
    return dsigma / (jnp.expm1(sigma) + 1.0 / softmin_snr)


def diffusion_loss(log_probs: jax.Array,
                   x0: jax.Array,
                   sigma: jax.Array,
                   dsigma: jax.Array,
                   *,
                   attention_mask: Optional[jax.Array] = None,
                   modality: Optional[jax.Array] = None,
                   batch_ignore: Optional[jax.Array] = None,
                   softmin_snr: Optional[float] = None,
                   cov_weight: Optional[float] = None,
                   no_ce_weighting: bool = False,
                   text_loss_weight: Optional[float] = None,
                   img_loss_weight: Optional[float] = None) -> LossOutput:
    """Compute the NELBO training loss.

    Args:
      log_probs: (B, L, V) normalized log p(x0|xt) from subs_parameterization.
      x0: (B, L) clean tokens.
      sigma, dsigma: (B,) total noise and rate at the sampled t.
      attention_mask: (B, L) bool; True where tokens are valid.
      modality: (B, L) 0/1; required when txt/img loss weights given.
      batch_ignore: (B,) bool; samples excluded from metrics (entire-modality
        masking for CFG training, reference: model.py:1139-1144).
      softmin_snr: gamma for softmin-SNR weighting (production: 5).
      text_loss_weight/img_loss_weight: separate modality weighting
        (production: 1.0 / 0.6; reference: model.py:1036-1057).

    Reference: model.py:960-1173.
    """
    b, l = x0.shape
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), dtype=bool)

    log_p_theta = jnp.take_along_axis(log_probs, x0[..., None], axis=-1).squeeze(-1)

    if cov_weight is not None:
        # change-of-variables / importance-sampling objective: CONSTANT
        # per-token weight log1p(-exp(-sigma_min)) replaces the time-
        # dependent NELBO weighting — the reference returns the raw
        # per-token tensor log_p * c early (model.py:969-970), bypassing
        # its own Loss plumbing; here it flows through the standard
        # masked-mean reduction (c < 0, so loss = -log_p * |c| >= 0)
        std_loss = log_p_theta * cov_weight
        loss = std_loss
    elif no_ce_weighting:
        # plain cross-entropy: constant per-token weight, softmin-SNR
        # bypassed too (reference trainer.no_ce_weighting,
        # model.py:972/989 — std_weighting = 1 and the softmin override
        # is skipped)
        std_loss = -log_p_theta
        loss = std_loss
    else:
        std_w = (dsigma / jnp.expm1(sigma))[:, None]
        std_loss = -log_p_theta * std_w  # per-token std NLL (metrics)
        loss = -log_p_theta * nelbo_weighting(sigma, dsigma,
                                              softmin_snr)[:, None]

    txt_loss_out = jnp.zeros((), loss.dtype)
    img_loss_out = jnp.zeros((), loss.dtype)

    if text_loss_weight is not None and img_loss_weight is not None:
        assert modality is not None
        txt_mask = (modality == 0) & attention_mask
        img_mask = (modality == 1) & attention_mask
        txt_count = txt_mask.sum()
        img_count = img_mask.sum()
        total = txt_count + img_count
        txt_frac = txt_count / total
        img_frac = img_count / total
        masked = loss * attention_mask
        # mean-per-modality, re-weighted by modality fraction and user weight
        # (reference: model.py:1036-1050)
        txt_loss_out = jnp.where(
            txt_count > 0,
            (masked * txt_mask).sum() / jnp.maximum(txt_count, 1) * txt_frac * text_loss_weight,
            0.0)
        img_loss_out = jnp.where(
            img_count > 0,
            (masked * img_mask).sum() / jnp.maximum(img_count, 1) * img_frac * img_loss_weight,
            0.0)
        total_loss = txt_loss_out + img_loss_out
    else:
        total_loss = (loss * attention_mask).sum() / jnp.maximum(attention_mask.sum(), 1)

    # metrics mask: drop batch elements with force-masked modalities
    metrics_mask = attention_mask
    if batch_ignore is not None:
        metrics_mask = metrics_mask & ~batch_ignore[:, None]

    return LossOutput(loss=total_loss,
                      nlls=std_loss * attention_mask,
                      token_mask=metrics_mask,
                      txt_loss=txt_loss_out,
                      img_loss=img_loss_out)


def ar_llm_token_nll(logits: jax.Array, x0: jax.Array, mask_index: int,
                     *,
                     modality: Optional[jax.Array] = None,
                     text_vocab_size: Optional[int] = None) -> jax.Array:
    """Per-token AR cross-entropy from RAW logits: mask column -inf,
    optional modality vocab restriction, log-softmax, gather at x0
    (reference: model.py:1083-1114 — the core shared by trainer.ar_llm_loss
    and the joint AR+NAR combine). Returns (B, L)."""
    from unidisc_tpu.diffusion.subs import NEG_INFINITY
    ids = jnp.arange(logits.shape[-1])
    logits = logits + jnp.where(ids == mask_index, NEG_INFINITY, 0.0)
    if modality is not None and text_vocab_size is not None:
        from unidisc_tpu.diffusion.subs import restrict_modality_logits
        logits = restrict_modality_logits(logits, modality, text_vocab_size)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(log_p, x0[..., None], axis=-1).squeeze(-1)


def ar_loss(logits: jax.Array, x0: jax.Array, mask_index: int,
            *,
            attention_mask: Optional[jax.Array] = None,
            modality: Optional[jax.Array] = None,
            text_vocab_size: Optional[int] = None) -> LossOutput:
    """Autoregressive next-token loss for the AR baseline (ar_shift applied by
    the caller: logits[:, :-1] vs x0[:, 1:]). Mask token is excluded from the
    output distribution (reference: model.py:761-782, 1011-1015)."""
    from unidisc_tpu.diffusion.subs import NEG_INFINITY
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    logits = logits + jnp.where(ids == mask_index, NEG_INFINITY, 0.0)
    if modality is not None and text_vocab_size is not None:
        from unidisc_tpu.diffusion.subs import restrict_modality_logits
        logits = restrict_modality_logits(logits, modality, text_vocab_size)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    log_p = jnp.take_along_axis(log_probs, x0[..., None], axis=-1).squeeze(-1)
    if attention_mask is None:
        attention_mask = jnp.ones(x0.shape, dtype=bool)
    nll = -log_p
    loss = (nll * attention_mask).sum() / jnp.maximum(attention_mask.sum(), 1)
    return LossOutput(loss=loss, nlls=nll * attention_mask,
                      token_mask=attention_mask,
                      txt_loss=jnp.zeros((), loss.dtype),
                      img_loss=jnp.zeros((), loss.dtype))
