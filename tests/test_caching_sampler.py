"""Attention-caching sampler tests (reference: model_eval.py:2297-2367).

Checks that the two-branch (full refresh / txt-only) scan produces coherent
samples: conditioning respected, everything unmasked, and the txt-only
steps really skip image updates (image tokens only change on full steps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.caching import build_caching_sampler

B = 2
TXT, IMG = 8, 16
L = TXT + IMG


def cache_config(**over):
    return Config.make("tiny").override(**{
        "model.length": L,
        "model.txt_length": TXT,
        "model.img_length": IMG,
        "model.text_vocab_size": 24,
        "model.image_vocab_size": 24,
        "model.dropout": 0.0,
        "model.time_conditioning": True,
        "model.force_argmax_valid_indices": True,
        "model.zero_linear_init": False,
        "sampling.steps": 8,
        "sampling.predictor": "maskgit",
        **over})


def run_sampler(cfg, seed=0):
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    sample = jax.jit(build_caching_sampler(model, cfg, txt_to_img_ratio=4))
    m = cfg.model
    rngnp = np.random.RandomState(seed)
    x0 = np.concatenate([
        rngnp.randint(0, m.text_vocab_size - 1, (B, TXT)),
        rngnp.randint(m.text_vocab_size, m.vocab_size, (B, IMG))],
        1).astype(np.int32)
    x0_unmask = np.zeros((B, L), bool)
    x0_unmask[:, :TXT] = True  # text prompt given, image generated
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out = sample(params, jax.random.PRNGKey(seed), jnp.asarray(x0),
                 jnp.asarray(x0_unmask), jnp.asarray(modality))
    return x0, np.asarray(out.tokens), int(out.nfe), m


def test_caching_sampler_completes_and_respects_conditioning():
    cfg = cache_config()
    x0, tokens, nfe, m = run_sampler(cfg)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :TXT], x0[:, :TXT])
    # generated image ids live in the image vocab slice
    assert (tokens[:, TXT:] >= m.text_vocab_size).all()
    # NFE accounting: 8 steps at ratio 4 -> 2 full + 6 txt + 1 final full;
    # effective = 3 + 6*8//24 = 5
    assert nfe == 3 + (6 * TXT) // L


def test_caching_sampler_with_cfg():
    cfg = cache_config(**{"sampling.cfg": 1.5})
    x0, tokens, nfe, m = run_sampler(cfg, seed=3)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :TXT], x0[:, :TXT])


def test_txt_only_steps_freeze_image_tokens():
    """With ratio > steps, only step 0 (and the final pass) are full —
    image tokens must be unmasked only at those points; intermediate
    txt-only steps can't reveal image tokens."""
    cfg = cache_config(**{"sampling.steps": 6})
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    m = cfg.model
    # ratio larger than steps: steps 1..5 are txt-only
    sample = jax.jit(build_caching_sampler(model, cfg,
                                           txt_to_img_ratio=100))
    x0 = np.zeros((B, L), np.int32)
    unmask = np.zeros((B, L), bool)
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out = sample(params, jax.random.PRNGKey(0), jnp.asarray(x0),
                 jnp.asarray(unmask), jnp.asarray(modality))
    tokens = np.asarray(out.tokens)
    # the run must still fully unmask (final full pass handles the rest)
    assert not (tokens == m.mask_index).any()
    # 1 full step + 5 txt steps + final: eff = 2 + 5*8//24 = 3
    assert int(out.nfe) == 2 + (5 * TXT) // L
