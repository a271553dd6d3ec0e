"""Sampler tests (reference behavior: model_eval.py:2042-3168).

Uses an oracle forward function (logits sharply peaked at a known target
sequence) so every predictor must recover the target exactly, plus unit
tests for the schedule/threshold helpers that replace the reference's
host-synced topk (model_eval.py:3086)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.sampling.sampler import (adaptive_schedule, build_sampler,
                                          confidence_threshold,
                                          nucleus_sample, sample_categorical)

B, L, V = 4, 24, 40
TXT = 8


def base_config(**over):
    cfg = Config.make("tiny")
    return cfg.override(**{
        "model.length": L,
        "model.txt_length": TXT,
        "model.img_length": L - TXT,
        "model.text_vocab_size": 20,
        "model.image_vocab_size": 20,
        **over})


def make_target(cfg):
    rng = np.random.RandomState(0)
    m = cfg.model
    txt = rng.randint(0, m.text_vocab_size - 1, (B, TXT))
    img = rng.randint(m.text_vocab_size, m.vocab_size, (B, L - TXT))
    tgt = jnp.asarray(np.concatenate([txt, img], 1), jnp.int32)
    modality = jnp.asarray(
        np.concatenate([np.zeros((B, TXT)), np.ones((B, L - TXT))], 1),
        jnp.int32)
    return tgt, modality


def oracle_forward(target, vocab):
    """Logits sharply peaked at `target`, independent of the input."""
    def fn(params, x, sigma, modality):
        onehot = jax.nn.one_hot(target, vocab)
        reps = x.shape[0] // target.shape[0]  # CFG doubles the batch
        return 50.0 * jnp.tile(onehot, (reps, 1, 1))
    return fn


@pytest.mark.parametrize("predictor", ["ddpm", "ddpm_cache", "maskgit",
                                       "maskgit_nucleus", "first_hitting"])
def test_predictor_recovers_oracle_target(predictor):
    cfg = base_config(**{"sampling.predictor": predictor,
                         "sampling.steps": 8,
                         "sampling.top_p": 0.9})
    tgt, modality = make_target(cfg)
    m = cfg.model
    sample = jax.jit(build_sampler(oracle_forward(tgt, m.vocab_size), cfg))
    x0 = jnp.zeros((B, L), jnp.int32)
    x0_unmask = jnp.zeros((B, L), bool)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), x0, x0_unmask, modality)
    assert (out.tokens == tgt).all(), predictor
    assert not (out.tokens == m.mask_index).any()
    assert int(out.nfe) >= 1


def test_conditioning_is_preserved():
    cfg = base_config(**{"sampling.predictor": "maskgit",
                         "sampling.steps": 6})
    tgt, modality = make_target(cfg)
    m = cfg.model
    # conditioning disagrees with the oracle: clamp must win
    x0 = (tgt + 1) % m.text_vocab_size
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)
    sample = jax.jit(build_sampler(oracle_forward(tgt, m.vocab_size), cfg))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), x0, x0_unmask, modality)
    assert (out.tokens[:, :TXT] == x0[:, :TXT]).all()
    assert (out.tokens[:, TXT:] == tgt[:, TXT:]).all()


def test_cfg_path_runs_and_recovers():
    cfg = base_config(**{"sampling.predictor": "ddpm",
                         "sampling.steps": 8,
                         "sampling.cfg": 2.0})
    tgt, modality = make_target(cfg)
    m = cfg.model
    sample = jax.jit(build_sampler(oracle_forward(tgt, m.vocab_size), cfg))
    x0 = tgt
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), x0, x0_unmask, modality)
    assert (out.tokens == tgt).all()


def test_ddpm_cache_saves_nfe():
    """With the oracle, everything unmasks on the first real step; the cache
    predictor must then skip forward evals (reference MDLM caching trick,
    model_eval.py:2072-2104)."""
    steps = 64  # steps >> tokens so many steps change nothing -> cache hits
    cfg = base_config(**{"sampling.predictor": "ddpm_cache",
                         "sampling.steps": steps})
    tgt, modality = make_target(cfg)
    sample = jax.jit(build_sampler(oracle_forward(tgt, cfg.model.vocab_size),
                                   cfg))
    x0 = jnp.zeros((B, L), jnp.int32)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), x0,
                 jnp.zeros((B, L), bool), modality)
    ddpm_cfg = cfg.override(**{"sampling.predictor": "ddpm"})
    sample2 = jax.jit(build_sampler(oracle_forward(tgt, cfg.model.vocab_size),
                                    ddpm_cfg))
    out2 = sample2(jnp.zeros(0), jax.random.PRNGKey(0), x0,
                   jnp.zeros((B, L), bool), modality)
    assert int(out.nfe) < int(out2.nfe)
    assert int(out2.nfe) == steps


def test_adaptive_schedule_sums_to_num_masked():
    num_masked = jnp.asarray([100, 57, 3, 1])
    for mode in ["root", "linear", "square", "cosine", "arccos"]:
        sche = adaptive_schedule(num_masked, 8, mode)
        assert sche.shape == (4, 8)
        # every step but the last unmasks at least one token (the last may
        # clamp to 0 after absorbing rounding overshoot); totals may
        # overshoot (the step clamps to the masked count) but never
        # undershoot
        assert (sche[:, :-1] >= 1).all()
        assert (sche[:, -1] >= 0).all()
        assert (sche.sum(-1) >= num_masked).all()


def test_confidence_threshold_matches_topk():
    rng = np.random.RandomState(1)
    conf = jnp.asarray(rng.randn(5, 32).astype(np.float32))
    k = jnp.asarray([1, 4, 32, 0, 7])
    th = confidence_threshold(conf, k)
    for i in range(5):
        sel = np.asarray(conf[i] >= th[i]).sum()
        assert sel == int(k[i]) if int(k[i]) > 0 else sel == 0


def test_sample_categorical_distribution():
    probs = jnp.asarray([[0.8, 0.2, 0.0, 0.0]])
    draws = jax.vmap(lambda k: sample_categorical(k, probs))(
        jax.random.split(jax.random.PRNGKey(0), 2000))
    frac = (draws == 0).mean()
    assert 0.75 < float(frac) < 0.85
    assert not (draws >= 2).any()


def test_nucleus_cuts_tail():
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    draws = jax.vmap(lambda k: nucleus_sample(k, probs, top_p=0.7))(
        jax.random.split(jax.random.PRNGKey(0), 500))
    # top-p=0.7 keeps {0.5, 0.3}; tail must never be drawn
    assert not (draws >= 2).any()
