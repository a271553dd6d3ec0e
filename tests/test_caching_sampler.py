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
    txt-only steps can't reveal image tokens. Asserts the invariant on
    the actual per-step trajectory (the -inf-threshold collapse where
    txt-only steps unmask ALL image positions from stale cached p_x0
    would fail here)."""
    cfg = cache_config(**{"sampling.steps": 6})
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    m = cfg.model
    # ratio larger than steps: steps 1..5 are txt-only
    sample = jax.jit(build_caching_sampler(model, cfg, txt_to_img_ratio=100,
                                           return_trajectory=True))
    x0 = np.zeros((B, L), np.int32)
    unmask = np.zeros((B, L), bool)
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out, traj = sample(params, jax.random.PRNGKey(0), jnp.asarray(x0),
                       jnp.asarray(unmask), jnp.asarray(modality))
    tokens = np.asarray(out.tokens)
    traj = np.asarray(traj)  # (steps, B, L)
    # image tokens after step 0 (the only full step) must stay frozen
    # through every txt-only step
    for i in range(1, traj.shape[0]):
        np.testing.assert_array_equal(traj[i, :, TXT:], traj[0, :, TXT:])
    # txt-only steps make progress on the text side
    assert (traj[-1, :, :TXT] != m.mask_index).sum() >= \
        (traj[0, :, :TXT] != m.mask_index).sum()
    # the run must still fully unmask (final full pass handles the rest)
    assert not (tokens == m.mask_index).any()
    # 1 full step + 5 txt steps + final: eff = 2 + 5*8//24 = 3
    assert int(out.nfe) == 2 + (5 * TXT) // L


def test_txt_only_steps_with_full_text_conditioning_select_nothing():
    """t2i path: text fully conditioned, so txt-only steps have ZERO
    eligible candidates — they must not unmask anything (previously thresh
    was -inf and -inf>=-inf unmasked every image position at once)."""
    cfg = cache_config(**{"sampling.steps": 6})
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    m = cfg.model
    sample = jax.jit(build_caching_sampler(model, cfg, txt_to_img_ratio=100,
                                           return_trajectory=True))
    rngnp = np.random.RandomState(7)
    x0 = np.concatenate([
        rngnp.randint(0, m.text_vocab_size - 1, (B, TXT)),
        np.zeros((B, IMG), np.int64)], 1).astype(np.int32)
    unmask = np.zeros((B, L), bool)
    unmask[:, :TXT] = True
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out, traj = sample(params, jax.random.PRNGKey(0), jnp.asarray(x0),
                       jnp.asarray(unmask), jnp.asarray(modality))
    traj = np.asarray(traj)
    # txt-only steps (1..5) change nothing at all
    for i in range(1, traj.shape[0]):
        np.testing.assert_array_equal(traj[i], traj[0])
    # step 0 (full) must not unmask more than its schedule allows: the
    # arccos schedule at 6 steps over 16 masked positions reveals far
    # fewer than all 16 at step 0
    step0_unmasked = (traj[0, :, TXT:] != m.mask_index).sum(-1)
    assert (step0_unmasked < IMG).all()
    # final pass completes the image
    assert not (np.asarray(out.tokens) == m.mask_index).any()


def test_caching_sampler_int8_kv_cache():
    """model.kv_cache_dtype='int8': the flex KV cache quantizes on write
    and attends in int8 (ops/quant.int8_kv_attention); the sampler must
    still fully unmask and respect conditioning."""
    cfg = cache_config(**{"model.kv_cache_dtype": "int8"})
    x0, toks, nfe, m = run_sampler(cfg)
    assert not (toks == m.mask_index).any()
    np.testing.assert_array_equal(toks[:, :TXT], x0[:, :TXT])
    assert nfe >= 1

def run_img_sampler(cfg, seed=0, ratio=0, steps=None):
    """t2i workload through the conditioning-frozen (recompute='img')
    mode: text fully given, image generated by img-only steps."""
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    m = cfg.model
    sample = jax.jit(build_caching_sampler(
        model, cfg, txt_to_img_ratio=ratio, recompute="img",
        num_steps=steps))
    rngnp = np.random.RandomState(seed)
    x0 = np.concatenate([
        rngnp.randint(0, m.text_vocab_size - 1, (B, TXT)),
        np.zeros((B, IMG), np.int64)], 1).astype(np.int32)
    x0_unmask = np.zeros((B, L), bool)
    x0_unmask[:, :TXT] = True
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out = sample(params, jax.random.PRNGKey(seed), jnp.asarray(x0),
                 jnp.asarray(x0_unmask), jnp.asarray(modality))
    return x0, np.asarray(out.tokens), int(out.nfe), m


def test_img_caching_sampler_completes_and_respects_conditioning():
    """recompute='img' (conditioning-frozen t2i): text K/V computed once
    at step 0, every denoise step recomputes only the image rows."""
    cfg = cache_config()
    x0, tokens, nfe, m = run_img_sampler(cfg, ratio=0)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :TXT], x0[:, :TXT])
    assert (tokens[:, TXT:] >= m.text_vocab_size).all()
    # 1 full (step 0) + 7 img steps + final full:
    # eff = 2 + (7 * IMG) // L
    assert nfe == 2 + (7 * IMG) // L


def test_img_caching_sampler_with_cfg_and_refresh():
    cfg = cache_config(**{"sampling.cfg": 1.5})
    x0, tokens, nfe, m = run_img_sampler(cfg, seed=3, ratio=4)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :TXT], x0[:, :TXT])
    # 8 steps at ratio 4 -> 2 full + 6 img + 1 final full
    assert nfe == 3 + (6 * IMG) // L


def test_img_only_steps_freeze_text_tokens():
    """Mirror of the txt-mode invariant: with text PARTIALLY masked and
    refresh only at step 0, img-only steps must never reveal a text
    position (their stale cached p_x0 is ineligible), while image
    positions make progress every step."""
    cfg = cache_config(**{"sampling.steps": 6})
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    m = cfg.model
    sample = jax.jit(build_caching_sampler(
        model, cfg, txt_to_img_ratio=0, recompute="img",
        return_trajectory=True))
    x0 = np.zeros((B, L), np.int32)
    unmask = np.zeros((B, L), bool)  # nothing conditioned: joint gen
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int32)
    out, traj = sample(params, jax.random.PRNGKey(0), jnp.asarray(x0),
                       jnp.asarray(unmask), jnp.asarray(modality))
    traj = np.asarray(traj)  # (steps, B, L)
    # text tokens after step 0 (the only full step) stay frozen through
    # every img-only step
    for i in range(1, traj.shape[0]):
        np.testing.assert_array_equal(traj[i, :, :TXT], traj[0, :, :TXT])
    # img-only steps make progress on the image side
    assert (traj[-1, :, TXT:] != m.mask_index).sum() > \
        (traj[0, :, TXT:] != m.mask_index).sum()
    # the final full pass completes everything
    assert not (np.asarray(out.tokens) == m.mask_index).any()


def test_img_caching_sampler_int8_kv():
    cfg = cache_config(**{"model.kv_cache_dtype": "int8"})
    x0, toks, nfe, m = run_img_sampler(cfg, ratio=0)
    assert not (toks == m.mask_index).any()
    np.testing.assert_array_equal(toks[:, :TXT], x0[:, :TXT])


def test_caching_sampler_rejects_bad_recompute():
    import pytest
    cfg = cache_config()
    model, params = init_dit(jax.random.PRNGKey(42), cfg.model)
    with pytest.raises(ValueError, match="recompute"):
        build_caching_sampler(model, cfg, recompute="both")
