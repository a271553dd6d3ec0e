"""Legacy parameterizations: SEDD (score entropy) and D3PM.

Pure-function ports of the reference's legacy MDLM/SEDD/D3PM support
(reference: model_utils.py — _score_entropy:269-302, get_score:371-405,
_d3pm_loss:604-630, _d3pm_parameterization:632-636,
_sedd_parameterization:638-646).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.diffusion.subs import NEG_INFINITY


def sedd_parameterization(logits: jax.Array, xt: jax.Array,
                          sigma: jax.Array) -> jax.Array:
    """Raw logits -> log score (reference: model_utils.py:638-646)."""
    esigm1_log = jnp.log(jnp.expm1(sigma))
    logits = logits - esigm1_log[:, None, None] - np.log(
        logits.shape[-1] - 1)
    ids = jnp.arange(logits.shape[-1])
    return jnp.where(ids == xt[..., None], 0.0, logits)


def d3pm_parameterization(logits: jax.Array, mask_index: int | None = None
                          ) -> jax.Array:
    """(reference: model_utils.py:632-636; subs_masking optional)."""
    if mask_index is not None:
        ids = jnp.arange(logits.shape[-1])
        logits = logits + jnp.where(ids == mask_index, NEG_INFINITY, 0.0)
    return jax.nn.log_softmax(logits, axis=-1)


def score_entropy(log_score: jax.Array, sigma: jax.Array, xt: jax.Array,
                  x0: jax.Array, mask_index: int) -> jax.Array:
    """SEDD loss per token (reference: model_utils.py:269-302). Shape-static:
    instead of boolean gather, masked positions are zeroed."""
    masked = xt == mask_index
    expsig_minus_1 = jnp.expm1(sigma)[:, None]
    q_ratio = 1.0 / expsig_minus_1

    neg_term = q_ratio * jnp.take_along_axis(
        log_score, x0[..., None], -1).squeeze(-1)
    score = jnp.exp(log_score)
    ids = jnp.arange(log_score.shape[-1])
    pos_term = jnp.where(ids == mask_index, 0.0, score).sum(-1)
    const = q_ratio * (jnp.log(q_ratio) - 1)
    entropy = pos_term - neg_term + const
    return jnp.where(masked, entropy, 0.0)


def d3pm_loss(model_output: jax.Array, xt: jax.Array, x0: jax.Array,
              t: jax.Array, T: int, mask_index: int) -> jax.Array:
    """Discrete-time D3PM loss (reference: model_utils.py:604-630)."""
    dt = 1.0 / T
    t = jnp.clip(t[:, None], 0.0, 1.0 - 1e-4)
    alpha_t = 1 - t
    alpha_s = 1 - (t - dt)

    log_x_theta_at_x0 = jnp.take_along_axis(
        model_output, x0[..., None], -1).squeeze(-1)
    log_x_theta_at_m = model_output[:, :, mask_index]
    x_theta_at_m = jnp.exp(log_x_theta_at_m)

    term_1_coef = dt / t
    term_1_log_nr = jnp.log(alpha_t * x_theta_at_m / t + 1)
    term_1_log_dr = log_x_theta_at_x0
    term_2_coef = 1 - dt / t
    term_2_log_nr = term_1_log_nr
    term_2_log_dr = jnp.log(alpha_s * x_theta_at_m / (t - dt) + 1)

    L_vb_masked = (term_1_coef * (term_1_log_nr - term_1_log_dr)
                   + term_2_coef * (term_2_log_nr - term_2_log_dr))
    L_vb = jnp.where(xt == mask_index, L_vb_masked, 0.0)
    return T * L_vb


def get_score(log_probs: jax.Array, x: jax.Array, sigma: jax.Array,
              mask_index: int) -> jax.Array:
    """SUBS model output -> score exp(log score)
    (reference: model_utils.py:371-405)."""
    log_k = -jnp.log(jnp.expm1(sigma))  # (B,)
    ids = jnp.arange(log_probs.shape[-1])

    masked_score = log_probs + log_k[:, None, None]
    masked_score = jnp.where(ids == mask_index, 0.0, masked_score)

    unmasked_score = jnp.full_like(log_probs, NEG_INFINITY)
    unmasked_score = jnp.where(ids == x[..., None], 0.0, unmasked_score)
    unmasked_score = jnp.where(
        ids == mask_index,
        -log_k[:, None, None] * jnp.ones_like(log_probs), unmasked_score)

    is_masked = (x == mask_index)[..., None]
    return jnp.exp(jnp.where(is_masked, masked_score, unmasked_score))


def staggered_score(score: jax.Array, dsigma: jax.Array,
                    mask_index: int) -> jax.Array:
    """(reference: model_utils.py:407-412)."""
    extra_const = (1 - jnp.exp(dsigma))[:, None] * score.sum(-1)
    score = score * jnp.exp(dsigma)[:, None, None]
    return score.at[..., mask_index].add(extra_const)


def transp_transition(i: jax.Array, sigma: jax.Array, vocab_size: int,
                      mask_index: int) -> jax.Array:
    """(reference: model_utils.py:433-438)."""
    sigma = sigma[:, None, None]
    edge = jnp.exp(-sigma) * jax.nn.one_hot(i, vocab_size)
    add = jnp.where(i == mask_index, 1 - jnp.exp(-sigma[..., 0]), 0.0)
    return edge + add[..., None]
