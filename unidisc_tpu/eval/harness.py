"""Evaluation harness: generation battery, speed eval, quality metrics.

Redesign of the reference's eval layer (reference: model_eval.py —
validation_step:656, on_validation_epoch_end:810, speed metrics
:983-1014 -> times.txt, gen-PPL via judge LM model_utils.py:514-603,
entropy, zero-shot accuracies model_setup.py:236-247). Judges are
pluggable callables; the NLL/likelihood scoring runs natively on TPU.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.forward_process import q_xt
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.diffusion.subs import subs_parameterization

LN2 = float(np.log(2.0))


# ---------------------------------------------------------------------------
# Speed eval (reference: model_eval.py:983-1014; warmup excluded)
# ---------------------------------------------------------------------------

def speed_eval(sample_fn, args, *, iters: int = 5, warmup: int = 1,
               tokens_per_sample: int, batch: int) -> Dict[str, float]:
    """Times a jitted sampler. Forces host transfers as completion barriers
    (block_until_ready is unreliable on tunneled platforms)."""
    nfe = 0
    for _ in range(warmup):
        out = sample_fn(*args)
        np.asarray(out.tokens)
    lat: List[float] = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = sample_fn(*args)
        np.asarray(out.tokens)
        lat.append(time.perf_counter() - t0)
        nfe = int(out.nfe)
    lat.sort()
    p50 = lat[len(lat) // 2]
    return {
        "p50_latency_s": p50,
        "avg_time_per_sample": sum(lat) / len(lat) / batch,
        "avg_time_per_token": sum(lat) / len(lat) / (batch *
                                                     tokens_per_sample),
        "tokens_per_sec": batch * tokens_per_sample * len(lat) / sum(lat),
        "avg_nfe_cnt": float(nfe),
    }


# ---------------------------------------------------------------------------
# Quality metrics
# ---------------------------------------------------------------------------

def token_entropy(token_ids: np.ndarray, vocab_size: int) -> float:
    """Empirical unigram entropy of generations (reference entropy metric,
    model_eval.py:1590-1733)."""
    counts = np.bincount(np.asarray(token_ids).reshape(-1),
                         minlength=vocab_size).astype(np.float64)
    p = counts / counts.sum()
    p = p[p > 0]
    return float(-(p * np.log(p)).sum())


def generative_perplexity(judge_logits_fn: Callable, token_ids,
                          *, eos_id: Optional[int] = None) -> float:
    """PPL of generated sequences under a judge LM
    (reference: model_utils.py:514-603 — GPT-2-large/Llama judge;
    judge_logits_fn(ids (B,L)) -> logits (B,L,V), causal)."""
    ids = jnp.asarray(token_ids)
    logits = judge_logits_fn(ids)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], -1).squeeze(-1)
    mask = jnp.ones_like(tgt, bool) if eos_id is None else (tgt != eos_id)
    ppl = jnp.exp((nll * mask).sum() / jnp.maximum(mask.sum(), 1))
    return float(ppl)


# ---------------------------------------------------------------------------
# Model likelihood scoring (zero-shot classification)
# ---------------------------------------------------------------------------

def sequence_nll(config: Config, apply_fn, params, batch, rng,
                 *, n_timesteps: int = 8) -> jax.Array:
    """Monte-Carlo NELBO estimate of -log p(x) per sequence using a
    deterministic stratified t-grid; the model's own likelihood score used
    for zero-shot Winoground/Datacomp-style accuracy
    (reference: model-likelihood reward get_rewards model_eval.py:3658+)."""
    m = config.model
    noise = get_noise(config.noise)
    x0 = batch["input_ids"]
    modality = batch.get("modality")
    b = x0.shape[0]
    ts = jnp.linspace(0.08, 0.92, n_timesteps)

    def one_t(carry, t):
        total, rng = carry
        rng, k = jax.random.split(rng)
        tt = jnp.full((b,), t)
        sigma = noise.total(tt)
        dsigma = noise.rate(tt)
        mc = 1 - jnp.exp(-sigma)
        corr = q_xt(k, x0, mc, m.mask_index, modality=modality)
        logits = apply_fn(params, corr.xt, sigma, modality)
        log_p = subs_parameterization(
            logits, corr.xt, m.mask_index,
            modality=modality if m.force_argmax_valid_indices else None,
            text_vocab_size=m.text_vocab_size)
        tok = jnp.take_along_axis(log_p, x0[..., None], -1).squeeze(-1)
        w = (dsigma / jnp.expm1(sigma))[:, None]
        nll = (-tok * w * corr.move_indices).sum(-1)
        return (total + nll, rng), None

    (total, _), _ = jax.lax.scan(one_t, (jnp.zeros(b), rng), ts)
    return total / n_timesteps


def zero_shot_similarity(config: Config, apply_fn, params, batch, rng,
                         *, n_timesteps: Optional[int] = None,
                         txt_cond: bool = True, cfg_w: Optional[float] = None,
                         force_cfg_value: bool = False,
                         do_unconditional: bool = False,
                         unweighed: bool = False,
                         pad_id: int = 0) -> jax.Array:
    """The reference's zero-shot similarity scorer, exactly
    (get_similarity, model_eval.py:268-340): per timestep on the interior
    grid linspace(0, 1, steps+2)[1:-1], corrupt with q_xt, clamp the
    conditioning span (text or image; skipped when do_unconditional),
    optionally CFG-combine raw logits with the annealed weight
    w = cfg*(1-t) (model_eval.py:2630-2640), SUBS log-probs, gather at x0,
    zero out pad + conditioned positions, weight by dsigma/expm1(sigma)
    (or not, `return_unweighed`), normalize per row by the non-pad count,
    and average over timesteps. Returns (B,) NLL-like scores (lower =
    more likely pairing).

    Path-faithful subtlety kept: the non-CFG path applies the SUBS
    carry-over against the CLAMPED input (forward(cond) uses xt=cond),
    while the CFG path applies it against the unclamped xt
    (model_eval.py:330-333 vs :318-323).
    """
    m = config.model
    noise = get_noise(config.noise)
    x0 = batch["input_ids"]
    modality = batch.get("modality")
    b = x0.shape[0]
    steps = n_timesteps or config.sampling.steps
    times = jnp.linspace(0.0, 1.0, steps + 2)[1:-1]

    pos = jnp.arange(x0.shape[1])[None, :]
    cond_mask = (pos < m.txt_length) if txt_cond else (pos >= m.txt_length)
    cond_mask = jnp.broadcast_to(cond_mask, x0.shape)
    pad_mask = x0 == pad_id

    def subs(logits, xt):
        return subs_parameterization(
            logits, xt, m.mask_index,
            modality=modality if m.force_argmax_valid_indices else None,
            text_vocab_size=m.text_vocab_size)

    def one_step(total, i):
        t = jnp.full((b,), times[i])
        sigma = noise.total(t)
        dsigma = noise.rate(t)
        mc = 1 - jnp.exp(-sigma)
        corr = q_xt(jax.random.fold_in(rng, i), x0, mc, m.mask_index,
                    modality=modality)
        xt = corr.xt
        cond = xt if do_unconditional else jnp.where(cond_mask, x0, xt)
        # the reference passes unet_conditioning=None here (model_eval.py
        # :316 "sigma[:, None] -> This causes CUDA OOM") — which only
        # runs for untimed models; for a time-conditioned model the real
        # sigma is the only runnable reading
        sig_in = sigma if m.time_conditioning else None
        if cfg_w is not None:
            uncond = jnp.where(cond_mask, m.mask_index, xt)
            logit_c = apply_fn(params, cond, sig_in, modality)
            logit_u = apply_fn(params, uncond, sig_in, modality)
            w = cfg_w if force_cfg_value else (cfg_w * (1 - t))[:, None,
                                                                None]
            log_p = subs((1 + w) * logit_c - w * logit_u, xt)
        else:
            log_p = subs(apply_fn(params, cond, sig_in, modality), cond)
        tok = jnp.take_along_axis(log_p, x0[..., None], -1).squeeze(-1)
        tok = jnp.where(pad_mask, 0.0, tok)
        if not do_unconditional:
            tok = jnp.where(cond_mask, 0.0, tok)
        w_std = 1.0 if unweighed else (dsigma / jnp.expm1(sigma))[:, None]
        loss = (-tok * w_std).sum(-1) / (~pad_mask).sum(-1)
        return total + loss, None

    total, _ = jax.lax.scan(one_step, jnp.zeros(b), jnp.arange(steps))
    return total / steps


def zero_shot_accuracy(config: Config, apply_fn, params, rng,
                       pair_batches: List[dict], *,
                       scorer: str = "similarity", **scorer_kw) -> float:
    """Image-text matching: for each item, candidate 0 is the true pairing;
    accuracy = fraction where the model assigns it the lowest NLL
    (reference: winoground/datacomp zero-shot evals, zero_shot_eval_step
    model_eval.py:264+). scorer: "similarity" (the reference's
    get_similarity estimator) or "nelbo" (sequence_nll)."""
    correct = 0
    total = 0
    for batch_set in pair_batches:
        nlls = []
        for cand in batch_set["candidates"]:
            if scorer == "similarity":
                score = zero_shot_similarity(config, apply_fn, params,
                                             cand, rng, **scorer_kw)
            else:
                score = sequence_nll(config, apply_fn, params, cand, rng)
            nlls.append(np.asarray(score))
        nlls = np.stack(nlls, 1)  # (B, n_candidates)
        correct += (nlls.argmin(1) == 0).sum()
        total += nlls.shape[0]
    return correct / max(total, 1)


# ---------------------------------------------------------------------------
# Generation battery
# ---------------------------------------------------------------------------

def generation_battery(engine, *, seeds=(0, 1), steps: Optional[int] = None
                       ) -> Dict[str, dict]:
    """Uncond / cond / infill generation sweep (reference:
    on_validation_epoch_end generation loop model_eval.py:886-1162)."""
    out = {}
    for seed in seeds:
        out[f"joint_{seed}"] = engine.run(task="joint", seed=seed,
                                          steps=steps)
        out[f"gen_image_{seed}"] = engine.run(text="sample prompt",
                                              seed=seed, steps=steps)
    return {k: {"nfe": v["nfe"], "text": v["text"][:50]}
            for k, v in out.items()}


# ---------------------------------------------------------------------------
# Masked-infill battery (reference: sample_masking model_eval.py:1836 —
# masked-infill viz tables with square-image and text-region masks)
# ---------------------------------------------------------------------------

def infill_battery(sample_fn, batch: dict, config: Config, rng,
                   *, txt_mask_rate: float = 0.5,
                   square_image_mask: bool = True,
                   text_region_mask: bool = True,
                   eos_id: Optional[int] = None) -> dict:
    """Regenerate masked regions of real data: a random contiguous text
    region (bounded by the first EOS, reference q_xt mask_text_region
    model.py:456-466) + a random square region of the image grid
    (mask_image_square model.py:440-454) — the reference's sample_masking
    viz battery applies both (model_eval.py:1915-1916). Returns original /
    conditioning-mask / regenerated token arrays for visualization or
    reconstruction metrics.

    sample_fn: jitted sampler (params-free closure or partial) taking
      (rng, x0, x0_unmask, modality) -> SampleResult.
    """
    from unidisc_tpu.diffusion.forward_process import (mask_image_square,
                                                       mask_text_region)

    m = config.model
    x0 = jnp.asarray(batch["input_ids"])
    modality = jnp.asarray(batch["modality"])
    b = x0.shape[0]
    k_txt, k_sq, k_s = jax.random.split(jnp.asarray(rng), 3)

    move = jax.random.uniform(k_txt, x0.shape) < txt_mask_rate
    move = move & (modality == 0)
    if text_region_mask:
        move = mask_text_region(
            jax.random.fold_in(k_txt, 1), move, x0, m.txt_length,
            m.text_vocab_size - 2 if eos_id is None else eos_id)
    if square_image_mask:
        move = mask_image_square(k_sq, move, m.txt_length, m.img_length)
    else:
        move = move | (jax.random.uniform(k_sq, x0.shape) < 0.5) \
            & (modality == 1)
    x0_unmask = ~move

    out = sample_fn(k_s, x0, x0_unmask, modality)
    tokens = np.asarray(out.tokens)
    recon_match = float((tokens == np.asarray(x0))[np.asarray(move)].mean())
    return {
        "original": np.asarray(x0),
        "masked": np.where(np.asarray(move), -1, np.asarray(x0)),
        "regenerated": tokens,
        "mask": np.asarray(move),
        "nfe": int(out.nfe),
        # fraction of masked tokens regenerated to the original value —
        # a cheap reconstruction-fidelity signal (not a quality metric)
        "masked_token_match": recon_match,
    }
