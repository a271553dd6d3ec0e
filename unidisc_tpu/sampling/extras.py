"""Additional samplers: analytic (SEDD), semi-AR block-stride, and
reward-guided Tweedie resampling.

References:
  * analytic/denoiser updates — model_utils.py:407-438 (_analytic_update,
    _denoiser_update) for the legacy SEDD score path
  * semi-AR — model_utils.py:305-348 sample_subs_guidance /
    restore_model_and_semi_ar_sample (block-stride generation)
  * Tweedie best-of-N — model_eval.py:3172+
    _ddpm_update_finetune_controlled_tweedie (resample-with-rewards)
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.legacy import (get_score, staggered_score,
                                          transp_transition)
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization
from unidisc_tpu.sampling.sampler import SampleResult, sample_categorical


def build_analytic_sampler(forward_logits: Callable, config: Config,
                           num_steps: Optional[int] = None) -> Callable:
    """SEDD analytic sampler as one lax.scan (legacy score-based path)."""
    m = config.model
    noise = get_noise(config.noise)
    steps = num_steps or config.sampling.steps
    eps = config.sampling.sampling_eps
    mask_index = m.mask_index

    def _draw(rng, probs, exp_noise):
        if exp_noise is not None:
            return jnp.argmax(probs / exp_noise, axis=-1)
        return sample_categorical(rng, probs)

    def analytic_update(rng, params, x, t, dt, modality, exp_noise=None):
        curr_sigma = noise.total(t)
        next_sigma = noise.total(t - dt)
        dsigma = curr_sigma - next_sigma
        logits = forward_logits(params, x, curr_sigma, modality)
        log_p = subs_parameterization(logits, x, mask_index)
        score = get_score(log_p, x, curr_sigma, mask_index)
        stag = staggered_score(score, dsigma, mask_index)
        probs = stag * transp_transition(x, dsigma, m.vocab_size, mask_index)
        return _draw(rng, probs, exp_noise)

    def denoiser_update(rng, params, x, t, modality, exp_noise=None):
        sigma = noise.total(t)
        logits = forward_logits(params, x, sigma, modality)
        log_p = subs_parameterization(logits, x, mask_index)
        score = get_score(log_p, x, sigma, mask_index)
        stag = staggered_score(score, sigma, mask_index)
        probs = stag * transp_transition(x, sigma, m.vocab_size, mask_index)
        probs = probs.at[..., mask_index].set(0)
        return _draw(rng, probs, exp_noise)

    def sample(params, rng, x0, x0_unmask, modality=None, injected=None):
        b, l = x0.shape
        x = jnp.where(x0_unmask, x0, mask_index)
        timesteps = jnp.linspace(1.0, eps, steps + 1)
        dt = (1.0 - eps) / steps

        def body(carry, i):
            x, rng = carry
            rng, k = jax.random.split(rng)
            t = jnp.full((b,), timesteps[i])
            exp_i = injected["exp"][i] if injected is not None else None
            x = analytic_update(k, params, x, t, dt, modality, exp_i)
            x = jnp.where(x0_unmask, x0, x)
            return (x, rng), None

        (x, rng), _ = jax.lax.scan(body, (x, rng), jnp.arange(steps))
        rng, k = jax.random.split(rng)
        t = jnp.full((b,), eps)
        exp_f = injected["exp"][steps] if injected is not None else None
        x = denoiser_update(k, params, x, t, modality, exp_f)
        x = jnp.where(x0_unmask, x0, x)
        return SampleResult(tokens=x, nfe=jnp.int32(steps + 1))

    return sample


def build_semi_ar_sampler(forward_logits: Callable, config: Config, *,
                          stride_length: int, num_strides: int,
                          steps_per_stride: Optional[int] = None,
                          dt: Optional[float] = None) -> Callable:
    """Semi-autoregressive block-stride generation, token-exact vs the
    reference (model_utils.py:305-332 sample_subs_guidance).

    Each stride re-masks the trailing `stride_length` positions of the
    previous window and denoises with int(1/dt)+1 ddpm-CACHING updates on
    the reference's grid t_i = 1 - i*dt — note the caching update uses
    the loglinear linearization move_chance = t directly
    (model_eval.py:2081-2082), and its LAST update runs at t=0 with
    t-dt < 0, i.e. a negative mask score that simply forces unmasking —
    followed by an unconditional argmax denoise at sigma=0
    (model_utils.py:323). The p_x0 cache is reused while x is unchanged
    and the model is not time-conditioned (model_utils.py:319-320).
    The stride loop is a host loop (num_strides is small); each stride's
    denoise is one jitted scan. steps_per_stride is shorthand for
    dt = 1/steps_per_stride. Pass injected={"exp": (num_strides+1,
    num_steps+1, B, L, V)} for token-parity testing.
    """
    m = config.model
    noise = get_noise(config.noise)
    mask_index = m.mask_index
    L = m.length
    if dt is None:
        dt = 1.0 / (steps_per_stride or 64)
    num_steps = int(1.0 / dt)
    time_conditioning = getattr(m, "time_conditioning", False)

    def log_p_x0(params, x, t, modality):
        logits = forward_logits(params, x, noise.total(t), modality)
        return subs_parameterization(logits, x, mask_index)

    @jax.jit
    def one_stride(params, rng, x, modality, injected_exp=None):
        b = x.shape[0]

        def body(carry, i):
            x, rng, p_cache, cache_valid, nfe = carry
            rng, k = jax.random.split(rng)
            t = jnp.full((b,), 1.0 - i * dt)

            def fresh(_):
                return log_p_x0(params, x, t, modality)

            log_p = jax.lax.cond(cache_valid, lambda _: p_cache, fresh,
                                 operand=None)
            nfe = nfe + jnp.where(cache_valid, 0, 1).astype(jnp.int32)
            # caching-update math in PROB space: mc_t = t, mc_s = t - dt
            # (the loglinear linearization, model_eval.py:2081-2092); the
            # final step's mc_s < 0 is intentional — it zeroes the mask
            # column's chance so every remaining mask resolves
            q_xs = jnp.exp(log_p) * dt
            q_xs = q_xs.at[..., mask_index].set(
                jnp.broadcast_to((t - dt)[:, None], x.shape))
            exp_i = injected_exp[i] if injected_exp is not None else None
            if exp_i is not None:
                new = jnp.argmax(q_xs / exp_i, axis=-1)
            else:
                new = sample_categorical(k, q_xs)
            x_next = jnp.where(x != mask_index, x, new)
            # cache stays valid while x is unchanged, never for
            # time-conditioned models (model_utils.py:319-320)
            cache_valid = jnp.all(x_next == x) & jnp.asarray(
                not time_conditioning)
            return (x_next, rng, log_p, cache_valid, nfe), None

        p0 = jnp.zeros((b, L, m.vocab_size), jnp.float32)
        carry = (x, rng, p0, jnp.asarray(False), jnp.int32(0))
        (x, rng, _, _, nfe), _ = jax.lax.scan(body, carry,
                                              jnp.arange(num_steps + 1))
        # final denoise: argmax of forward at sigma=0 (model_utils.py:323)
        logits = forward_logits(params, x, jnp.zeros((b,)), modality)
        x = jnp.argmax(subs_parameterization(logits, x, mask_index),
                       axis=-1)
        return x, nfe + 1

    def sample(params, rng, batch_size: int, modality=None, injected=None):
        total_nfe = 0
        target = None
        chunks = []
        for s in range(num_strides + 1):
            rng, k = jax.random.split(rng)
            x = jnp.full((batch_size, L), mask_index, jnp.int32)
            if target is not None:
                x = x.at[:, :L - stride_length].set(target)
            exp_s = injected["exp"][s] if injected is not None else None
            x, nfe = one_stride(params, k, x, modality, exp_s)
            total_nfe += int(nfe)
            chunks.append(x[:, :stride_length])
            target = x[:, stride_length:]
        chunks.append(target)
        tokens = jnp.concatenate(chunks, axis=1)
        return SampleResult(tokens=tokens, nfe=jnp.int32(total_nfe))

    return sample


def build_tweedie_sampler(forward_logits: Callable, config: Config,
                          reward_fn: Callable, *, n_candidates: int = 4,
                          num_steps: Optional[int] = None,
                          reward_on: str = "tokens") -> Callable:
    """Reward-guided best-of-N resampling per denoise step
    (reference: model_eval.py:3172+ _ddpm_update_finetune_controlled_tweedie).

    reward_on selects the scoring input:
      * "tokens" — reward_fn(candidate tokens (B, L)) -> (B,); cheap, no
        extra forward (model-likelihood / trained reward heads).
      * "tweedie_img" — the reference's exact semantics: per candidate run
        the denoiser again at sigma_s, form E[x0|xt] over the IMAGE vocab
        (text vocab and mask zeroed, model_eval.py:3220-3231), argmax to
        image token ids, and reward_fn(img_ids (B, img_length)) -> (B,)
        scores the predicted clean image (the reference decodes these ids
        through the VQ decoder and scores pixels — fold the decode into
        reward_fn). Costs one extra forward per candidate per step.

    The per-step winner is the argmax-score candidate per batch row
    (softmax over candidates then argmax in the reference — identical
    selection). Pass injected={"exp": (steps, N, B, L, V)} exponential
    noise for token-parity testing against the reference code.
    """
    m = config.model
    noise = get_noise(config.noise)
    steps = num_steps or config.sampling.steps
    eps = config.sampling.sampling_eps
    mask_index = m.mask_index
    assert reward_on in ("tokens", "tweedie_img")

    def p_x0(params, x, sigma, modality):
        logits = forward_logits(params, x, sigma, modality)
        return jnp.exp(subs_parameterization(logits, x, mask_index))

    def expected_img_ids(params, cand, sigma_s, modality):
        # E[x0|xt] restricted to the image vocab (model_eval.py:3227-3231)
        p = p_x0(params, cand, sigma_s, modality)
        v = p.shape[-1]
        ids = jnp.arange(v)
        img_section = ids >= m.text_vocab_size
        p = jnp.where(img_section, p + 1e-6, 0.0)
        p = p.at[..., mask_index].set(0.0)
        arg = jnp.argmax(p, axis=-1) - m.text_vocab_size
        return arg[:, m.txt_length:]  # (B, img_length)

    def sample(params, rng, x0, x0_unmask, modality=None, injected=None):
        b, l = x0.shape
        x = jnp.where(x0_unmask, x0, mask_index)
        timesteps = jnp.linspace(1.0, eps, steps + 1)
        dt = (1.0 - eps) / steps

        def body(carry, i):
            x, rng = carry
            rng, k_cand, k_pick = jax.random.split(rng, 3)
            t = jnp.full((b,), timesteps[i])
            sigma_t = noise.total(t)
            sigma_s = noise.total(t - dt)
            mc_t = (1 - jnp.exp(-sigma_t))[:, None, None]
            mc_s = (1 - jnp.exp(-sigma_s))[:, None, None]
            p = p_x0(params, x, sigma_t, modality)
            q_xs = p * (mc_t - mc_s)
            q_xs = q_xs.at[:, :, mask_index].set(mc_s[:, :, 0])

            def one_candidate(key, exp_noise):
                if exp_noise is not None:
                    new = jnp.argmax(q_xs / exp_noise, axis=-1)
                else:
                    new = sample_categorical(key, q_xs)
                cand = jnp.where(x != mask_index, x, new)
                return jnp.where(x0_unmask, x0, cand)

            keys = jax.random.split(k_cand, n_candidates)
            if injected is not None:
                cands = jax.vmap(lambda k, e: one_candidate(k, e))(
                    keys, injected["exp"][i])
            else:
                cands = jax.vmap(lambda k: one_candidate(k, None))(keys)

            if reward_on == "tweedie_img":
                rewards = jax.vmap(
                    lambda c: reward_fn(
                        expected_img_ids(params, c, sigma_s, modality))
                )(cands)                                 # (N, B)
            else:
                rewards = jax.vmap(reward_fn)(cands)     # (N, B)
            best = jnp.argmax(rewards, axis=0)           # (B,)
            x = jnp.take_along_axis(
                cands, best[None, :, None], axis=0)[0]
            return (x, rng), None

        (x, rng), _ = jax.lax.scan(body, (x, rng), jnp.arange(steps))
        # final noise removal
        t = jnp.full((b,), eps)
        p = p_x0(params, x, noise.total(t), modality)
        x = jnp.where(x == mask_index, jnp.argmax(p, -1), x)
        x = jnp.where(x0_unmask, x0, x)
        return SampleResult(tokens=x, nfe=jnp.int32(
            steps * (1 + (n_candidates if reward_on == "tweedie_img" else 0))
            + 1))

    return sample


def class_conditional_prior(label, config: Config):
    """Build (x0, x0_unmask) for label-as-token class-conditional
    generation (reference: trainer.add_label — the class id +
    model.label_shift sits at position 0 and is the only conditioning;
    sampling re-masks it on the CFG unconditional branch like any other
    conditioning token).

    label: (B,) int class ids in [0, model.add_labels).
    Returns x0 (B, L) int32 (mask everywhere except position 0) and
    x0_unmask (B, L) bool.
    """
    m = config.model
    assert m.add_labels, "class_conditional_prior needs model.add_labels"
    label = jnp.asarray(label, jnp.int32)
    b = label.shape[0]
    x0 = jnp.full((b, m.length), m.mask_index, jnp.int32)
    x0 = x0.at[:, 0].set(label + m.label_shift)
    x0_unmask = jnp.zeros((b, m.length), bool).at[:, 0].set(True)
    return x0, x0_unmask
