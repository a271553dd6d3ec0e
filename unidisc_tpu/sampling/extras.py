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
                          steps_per_stride: int = 64) -> Callable:
    """Semi-autoregressive block-stride generation: repeatedly slide the
    window left by `stride_length`, re-mask the tail, and run masked
    diffusion (reference: model_utils.py:305-348). The stride loop is a
    host loop (num_strides is small); each stride is one jitted scan."""
    from unidisc_tpu.sampling.sampler import build_sampler
    inner_cfg = config.override(**{
        "sampling.predictor": "ddpm_cache",
        "sampling.steps": steps_per_stride})
    inner = jax.jit(build_sampler(forward_logits, inner_cfg))
    m = config.model
    L = m.length

    def sample(params, rng, batch_size: int, modality=None):
        total_nfe = 0
        target = None
        chunks = []
        for s in range(num_strides + 1):
            rng, k = jax.random.split(rng)
            x0 = jnp.zeros((batch_size, L), jnp.int32)
            unmask = jnp.zeros((batch_size, L), bool)
            if target is not None:
                x0 = x0.at[:, :L - stride_length].set(target)
                unmask = unmask.at[:, :L - stride_length].set(True)
            out = inner(params, k, x0, unmask, modality)
            total_nfe += int(out.nfe)
            chunks.append(out.tokens[:, :stride_length])
            target = out.tokens[:, stride_length:]
        chunks.append(target)
        tokens = jnp.concatenate(chunks, axis=1)
        return SampleResult(tokens=tokens, nfe=jnp.int32(total_nfe))

    return sample


def build_tweedie_sampler(forward_logits: Callable, config: Config,
                          reward_fn: Callable, *, n_candidates: int = 4,
                          num_steps: Optional[int] = None) -> Callable:
    """Reward-guided best-of-N resampling per denoise step
    (reference: model_eval.py:3172+). reward_fn(tokens (B,L)) -> (B,)
    scores, jittable (e.g. model-likelihood or a trained reward head)."""
    m = config.model
    noise = get_noise(config.noise)
    steps = num_steps or config.sampling.steps
    eps = config.sampling.sampling_eps
    mask_index = m.mask_index

    def p_x0(params, x, t, modality):
        logits = forward_logits(params, x, noise.total(t), modality)
        return jnp.exp(subs_parameterization(logits, x, mask_index))

    def sample(params, rng, x0, x0_unmask, modality=None):
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
            p = p_x0(params, x, t, modality)
            q_xs = p * (mc_t - mc_s)
            q_xs = q_xs.at[:, :, mask_index].set(mc_s[:, :, 0])

            def one_candidate(key):
                new = sample_categorical(key, q_xs)
                cand = jnp.where(x != mask_index, x, new)
                return jnp.where(x0_unmask, x0, cand)

            cands = jax.vmap(one_candidate)(
                jax.random.split(k_cand, n_candidates))  # (N, B, L)
            rewards = jax.vmap(reward_fn)(cands)         # (N, B)
            best = jnp.argmax(rewards, axis=0)           # (B,)
            x = jnp.take_along_axis(
                cands, best[None, :, None], axis=0)[0]
            return (x, rng), None

        (x, rng), _ = jax.lax.scan(body, (x, rng), jnp.arange(steps))
        # final noise removal
        t = jnp.full((b,), eps)
        p = p_x0(params, x, t, modality)
        x = jnp.where(x == mask_index, jnp.argmax(p, -1), x)
        x = jnp.where(x0_unmask, x0, x)
        return SampleResult(tokens=x, nfe=jnp.int32(steps + 1))

    return sample
