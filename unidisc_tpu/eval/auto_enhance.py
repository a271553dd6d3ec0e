"""Auto-enhance: zero-shot editing by partial re-masking + reward re-ranking.

Redesign of the reference's flagship editing loop
(reference: model_eval.py:3729-3970 auto_enhance — gaussian-mean partial
masking rates txt~N(0.85, 0.24)/img~N(0.95, 0.024) :3809-3838, N candidate
regenerations, reward scoring get_rewards:3658-3706, best-of re-ranking;
LLM caption augmentation unidisc/utils/simple_llm.py is an optional hook).

The candidate loop runs under vmap over seeds — all K candidates regenerate
in ONE device program instead of the reference's sequential Python loop.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config


def partial_remask(rng: jax.Array, batch_size: int, txt_length: int,
                   img_length: int, *,
                   mean_txt: float = 0.85, std_txt: float = 0.2 / 0.8416,
                   mean_img: float = 0.95, std_img: float = 0.04 / 1.645):
    """Sample per-element masking rates and boolean re-mask maps
    (reference: model_eval.py:3809-3838). Returns x0_unmask (True = keep)."""
    k_t, k_i, k_ut, k_ui = jax.random.split(rng, 4)
    t_txt = jnp.clip(mean_txt + std_txt * jax.random.normal(
        k_t, (batch_size, 1)), max=1.0)
    t_img = jnp.clip(mean_img + std_img * jax.random.normal(
        k_i, (batch_size, 1)), max=1.0)
    move_txt = jax.random.uniform(k_ut, (batch_size, txt_length)) < t_txt
    move_img = jax.random.uniform(k_ui, (batch_size, img_length)) < t_img
    move = jnp.concatenate([move_txt, move_img], axis=-1)
    return ~move


def build_auto_enhance(sample_fn: Callable, config: Config,
                       reward_fn: Callable, *, n_candidates: int = 4,
                       use_low_masking: bool = False) -> Callable:
    """enhance(params, rng, tokens, modality) -> (best_tokens, rewards).

    sample_fn: jitted sampler (params, rng, x0, x0_unmask, modality)
      -> SampleResult.
    reward_fn: (tokens (B, L)) -> (B,) scores — model-likelihood, CLIP,
      aesthetic, or any weighted combination (reference get_rewards).
    """
    m = config.model
    img_kw = {}
    if use_low_masking:
        img_kw = dict(mean_img=0.75, std_img=0.04 / 1.645)

    def enhance(params, rng, tokens, modality):
        b = tokens.shape[0]
        base_reward = reward_fn(tokens)

        def one_candidate(key):
            k_mask, k_samp = jax.random.split(key)
            keep = partial_remask(k_mask, b, m.txt_length, m.img_length,
                                  **img_kw)
            out = sample_fn(params, k_samp, tokens, keep, modality)
            return out.tokens, reward_fn(out.tokens)

        cand_tokens, cand_rewards = jax.vmap(one_candidate)(
            jax.random.split(rng, n_candidates))   # (K,B,L), (K,B)

        # include the original: only accept improvements
        all_tokens = jnp.concatenate([tokens[None], cand_tokens], 0)
        all_rewards = jnp.concatenate([base_reward[None], cand_rewards], 0)
        best = jnp.argmax(all_rewards, axis=0)      # (B,)
        best_tokens = jnp.take_along_axis(
            all_tokens, best[None, :, None], axis=0)[0]
        return best_tokens, all_rewards

    return enhance


def build_caption_enhance(sample_fn: Callable, config: Config,
                          reward_fn: Callable, tokenizer, augmenter,
                          *, max_augmentations: int = 10) -> Callable:
    """Caption-augmented enhance: regenerate the image span under LLM-style
    caption variants and keep the best-scoring candidate.

    Mirrors the reference's augmented-caption battery
    (model_eval.py:3755-3800: decode captions, llm_func per caption,
    re-tokenize each variant into the text span, regenerate, score); the
    augmenter comes from utils/caption_llm.get_caption_augmenter. All K
    variant regenerations for a sample run as ONE vmapped device program.

    Returns enhance(params, rng, tokens, modality) ->
    (best_tokens (B, L), rewards (K+1, B), variant_captions list[list[str]]).
    """
    import numpy as np

    from unidisc_tpu.utils.caption_llm import augment_batch

    m = config.model

    def regen(params, rng, variant_tokens, modality):
        # Keep the (new) text span, regenerate the whole image span.
        keep = jnp.concatenate([
            jnp.ones((variant_tokens.shape[0], m.txt_length), bool),
            jnp.zeros((variant_tokens.shape[0], m.img_length), bool)], -1)
        out = sample_fn(params, rng, variant_tokens, keep, modality)
        return out.tokens, reward_fn(out.tokens)

    def enhance(params, rng, tokens, modality):
        b = tokens.shape[0]
        captions = tokenizer.batch_decode(
            np.asarray(tokens[:, :m.txt_length]))
        variants = augment_batch(augmenter, captions,
                                 max_per_caption=max_augmentations,
                                 shuffle_seed=0)
        k = min(len(v) for v in variants)
        txt = np.stack([
            tokenizer([v[j] for v in variants],
                      max_length=m.txt_length)["input_ids"]
            for j in range(k)])                       # (K, B, Lt)
        variant_tokens = jnp.concatenate([
            jnp.asarray(txt),
            jnp.broadcast_to(tokens[None, :, m.txt_length:],
                             (k, b, m.img_length))], -1)
        cand_tokens, cand_rewards = jax.vmap(
            lambda key, vt: regen(params, key, vt, modality))(
            jax.random.split(rng, k), variant_tokens)  # (K,B,L), (K,B)
        all_tokens = jnp.concatenate([tokens[None], cand_tokens], 0)
        all_rewards = jnp.concatenate(
            [reward_fn(tokens)[None], cand_rewards], 0)
        best = jnp.argmax(all_rewards, axis=0)
        best_tokens = jnp.take_along_axis(
            all_tokens, best[None, :, None], axis=0)[0]
        return best_tokens, all_rewards, variants

    return enhance


def model_likelihood_reward(config: Config, apply_fn, params,
                            rng: jax.Array) -> Callable:
    """Reward = negative NELBO estimate (higher = more likely under the
    model); the default judge when external reward models are offline
    (reference model-likelihood reward, model_eval.py:3658+)."""
    from unidisc_tpu.eval.harness import sequence_nll

    def reward(tokens):
        b = tokens.shape[0]
        modality = jnp.concatenate([
            jnp.zeros((b, config.model.txt_length), jnp.int32),
            jnp.ones((b, config.model.img_length), jnp.int32)], -1)
        batch = {"input_ids": tokens, "modality": modality}
        return -sequence_nll(config, apply_fn, params, batch, rng,
                             n_timesteps=4)
    return reward
