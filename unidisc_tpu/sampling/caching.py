"""Attention-caching inference: txt-only steps against cached image KV.

Redesign of the reference's attention-caching schedule
(reference: model_eval.py:2297-2367 — most denoising steps recompute only
the text slice against cached image K/V; every
`attention_caching_txt_to_img_ratio`-th step does a full refresh that also
updates the image predictions; flex-attention KV cache
models/dit.py:610-614,784-812).

TPU-native structure: ONE `lax.scan` whose body `lax.cond`s between two
branches with identical carry structure:
  * full step  — forward over the whole [txt|img] sequence, refreshing both
    the per-layer KV cache and the image p_x0 cache (1 full NFE)
  * txt step   — forward over only the first `txt_length` positions; their
    K/V overwrite the cache's text region and queries attend to the whole
    cache (live txt + stale img). Image p_x0 comes from the cache.
    (txt_length/L of a full NFE)

`recompute="img"` is the MIRROR mode for text→image generation (no direct
reference counterpart — the reference's schedule only exists for the
interleaved-editing direction): the text tokens are fixed CONDITIONING, so
their K/V are computed on full-refresh steps and every other step runs the
forward over only the image rows (`cache_index=txt_length` writes the
cache's image region; full attention reads the whole cache, so image
queries see the frozen text K/V). The approximation is symmetric: frozen
text representations go stale w.r.t. the evolving image between refreshes.
With the production modality-gated modulation only image rows carry time
conditioning, so the cached text K/V have no stale-sigma component. Cost
per img step is (img_length/L) of a full NFE in trunk matmuls and an
(img × L) score block instead of (L × L). `txt_to_img_ratio <= 0` means
refresh ONLY at step 0 (pure conditioning-frozen sampling).

Works with the maskgit confidence updater (the FID-eval path).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config
from unidisc_tpu.sampling.ar_sampler import init_kv_cache_for
from unidisc_tpu.sampling.sampler import (SampleResult, adaptive_schedule,
                                          confidence_threshold,
                                          sample_categorical)
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization


def build_caching_sampler(model, config: Config, *,
                          txt_to_img_ratio: int = 4,
                          num_steps=None,
                          return_trajectory: bool = False,
                          recompute: str = "txt") -> Callable:
    """Returns sample(params, rng, x0, x0_unmask, modality) -> SampleResult.

    The model must be a DIT with full (non-causal) attention; kv_cache
    support provides the cached-decode path.

    With return_trajectory=True the sampler returns
    (SampleResult, (steps, B, L) per-step token states) — used by tests to
    enforce the txt-only-freeze invariant and by viz denoise strips.
    """
    if recompute not in ("txt", "img"):
        raise ValueError(f"recompute must be 'txt' or 'img', got "
                         f"{recompute!r}")
    m = config.model
    s = config.sampling
    noise = get_noise(config.noise)
    steps = num_steps or s.steps
    mask_index = m.mask_index
    Lt, L = m.txt_length, m.length
    use_cfg = s.cfg is not None

    def forward_full(params, x, sigma, modality, kv):
        logits, kv = model.apply({"params": params}, x, sigma,
                                 modality=modality, kv_cache=kv,
                                 cache_index=0)
        return logits, kv

    def forward_txt(params, x_txt, sigma, modality_txt, kv):
        logits, kv = model.apply({"params": params}, x_txt, sigma,
                                 modality=modality_txt, kv_cache=kv,
                                 cache_index=0)
        return logits, kv

    def forward_img(params, x_img, sigma, modality_img, kv):
        # image rows live at positions [Lt, L): cache_index=Lt writes the
        # cache's image region and slices the multimodal rope table at the
        # image offset (2D rope rows under rope_2d)
        logits, kv = model.apply({"params": params}, x_img, sigma,
                                 modality=modality_img, kv_cache=kv,
                                 cache_index=Lt)
        return logits, kv

    def cfg_weight(t):
        return s.cfg * (1 - t)

    def p_from_logits(logits, x, modality, t):
        if use_cfg:
            lc, lu = jnp.split(logits, 2, axis=0)
            w = cfg_weight(t)[: lc.shape[0], None, None]
            logits = (1 + w) * lc - w * lu
            xx = None
        else:
            xx = x
        kw = dict(modality=modality, text_vocab_size=m.text_vocab_size) \
            if m.force_argmax_valid_indices else {}
        return jnp.exp(subs_parameterization(logits, xx, mask_index, **kw))

    def sample(params, rng, x0, x0_unmask, modality):
        b = x0.shape[0]
        bb = 2 * b if use_cfg else b
        x = jnp.where(x0_unmask, x0, mask_index)
        schedule = adaptive_schedule((x == mask_index).sum(-1), steps,
                                     s.maskgit_mode)
        timesteps = jnp.linspace(1.0, s.sampling_eps, steps + 1)
        # honors model.kv_cache_dtype='int8' — the cached image
        # K/V re-read on every txt-only step halves
        kv = init_kv_cache_for(m, bb, L)
        p_cache = jnp.zeros((b, L, m.vocab_size), jnp.float32)

        def model_batch(x, unmask):
            if use_cfg:
                x_uncond = jnp.where(unmask, mask_index, x)
                return jnp.concatenate([x, x_uncond], 0)
            return x

        def mod_batch(mod):
            return jnp.concatenate([mod, mod], 0) if use_cfg else mod

        def sigma_batch(t):
            sigma = noise.total(t)
            return jnp.concatenate([sigma, sigma]) if use_cfg else sigma

        def full_step(x, t, kv, _p):
            sigma = sigma_batch(t)
            logits, kv = forward_full(params, model_batch(x, x0_unmask),
                                      sigma, mod_batch(modality), kv)
            p = p_from_logits(logits.astype(jnp.float32), x, modality, t)
            return p, kv, jnp.int32(1)

        def txt_step(x, t, kv, p_cache):
            sigma = sigma_batch(t)
            x_txt = x[:, :Lt]
            logits, kv = forward_txt(params,
                                     model_batch(x_txt, x0_unmask[:, :Lt]),
                                     sigma, mod_batch(modality[:, :Lt]), kv)
            p_txt = p_from_logits(logits.astype(jnp.float32), x_txt,
                                  modality[:, :Lt], t)
            p = jnp.concatenate([p_txt, p_cache[:, Lt:]], axis=1)
            return p, kv, jnp.int32(1)  # partial NFE counted as 1 txt pass

        def img_step(x, t, kv, p_cache):
            sigma = sigma_batch(t)
            x_img = x[:, Lt:]
            logits, kv = forward_img(params,
                                     model_batch(x_img, x0_unmask[:, Lt:]),
                                     sigma, mod_batch(modality[:, Lt:]), kv)
            p_img = p_from_logits(logits.astype(jnp.float32), x_img,
                                  modality[:, Lt:], t)
            p = jnp.concatenate([p_cache[:, :Lt], p_img], axis=1)
            return p, kv, jnp.int32(1)

        partial_step = img_step if recompute == "img" else txt_step

        def body(carry, i):
            x, kv, p_cache, rng, nfe, txt_nfe = carry
            rng, k_tok, k_g = jax.random.split(rng, 3)
            t = jnp.full((b,), timesteps[i])
            if txt_to_img_ratio > 0:
                is_full = (i % txt_to_img_ratio) == 0
            else:
                # refresh only at step 0: pure conditioning-frozen sampling
                is_full = i == 0

            p, kv, _ = jax.lax.cond(
                is_full,
                lambda args: full_step(*args),
                lambda args: partial_step(*args),
                (x, t, kv, p_cache))

            # maskgit confidence update (reference: model_eval.py:3045-3114)
            copy = x != mask_index
            # txt-only steps may only unmask text positions; clamp the
            # schedule to the actually-eligible candidates so a step with
            # zero finite-conf positions selects NOTHING (an all -inf row
            # would otherwise make thresh=-inf and -inf>=-inf unmask every
            # masked position from stale cached p_x0 at once).
            img_pos = jnp.arange(L) >= Lt
            part_ok = img_pos if recompute == "img" else ~img_pos
            eligible = (~copy) & (is_full | part_ok[None, :])
            num_unmask = jnp.minimum(schedule[:, i], eligible.sum(-1))
            pred = sample_categorical(k_tok, p)
            conf = jnp.take_along_axis(p, pred[..., None], -1).squeeze(-1)
            gumbel = jax.random.gumbel(k_g, pred.shape)
            conf = jnp.log(jnp.maximum(conf, 1e-30)) + \
                s.maskgit_r_temp * gumbel * t[:, None]
            conf = jnp.where(eligible, conf, -jnp.inf)
            thresh = confidence_threshold(conf, num_unmask)
            sel = (conf >= thresh) & jnp.isfinite(conf)
            x_next = jnp.where(sel, pred, x)
            x_next = jnp.where(copy, x, x_next)
            x_next = jnp.where(x0_unmask, x0, x_next)

            nfe = nfe + jnp.where(is_full, 1, 0).astype(jnp.int32)
            txt_nfe = txt_nfe + jnp.where(is_full, 0, 1).astype(jnp.int32)
            ys = x_next if return_trajectory else None
            return (x_next, kv, p, rng, nfe, txt_nfe), ys

        carry = (x, kv, p_cache, rng, jnp.int32(0), jnp.int32(0))
        (x, kv, p, rng, nfe, txt_nfe), traj = jax.lax.scan(
            body, carry, jnp.arange(steps))

        # noise removal with a final full pass
        t = jnp.full((b,), s.sampling_eps)
        p, kv, _ = full_step(x, t, kv, p)
        x = jnp.where(x == mask_index, jnp.argmax(p, -1), x)
        x = jnp.where(x0_unmask, x0, x)
        # effective NFE: full passes + partial passes weighted by length
        # share (txt mode recomputes Lt rows, img mode L - Lt rows)
        part_len = (L - Lt) if recompute == "img" else Lt
        eff = nfe + 1 + (txt_nfe * part_len) // L
        result = SampleResult(tokens=x, nfe=eff)
        if return_trajectory:
            return result, traj
        return result

    return sample
