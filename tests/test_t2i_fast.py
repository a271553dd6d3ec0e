"""Span-factored t2i sampler tests: the factored head must equal the full
forward's logits slice exactly (same params, sliced matmul)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.t2i_fast import (_img_head, build_t2i_sampler)

B, TXT, IMG = 2, 8, 16
L = TXT + IMG


def cfg(**over):
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": TXT, "model.img_length": IMG,
        "model.text_vocab_size": 24, "model.image_vocab_size": 40,
        "model.time_conditioning": True, "model.dropout": 0.0,
        "model.zero_linear_init": False,
        "model.force_argmax_valid_indices": True,
        "sampling.predictor": "maskgit", "sampling.steps": 6,
        **over})


def test_factored_head_matches_full_forward():
    config = cfg()
    m = config.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    x = jnp.asarray(np.concatenate([
        rng.randint(0, m.text_vocab_size - 1, (B, TXT)),
        rng.randint(m.text_vocab_size, m.vocab_size, (B, IMG))], 1),
        jnp.int32)
    modality = jnp.concatenate([jnp.zeros((B, TXT), jnp.int32),
                                jnp.ones((B, IMG), jnp.int32)], -1)
    sigma = jnp.asarray([0.4, 0.8])

    full = model.apply({"params": params}, x, sigma, modality=modality)
    _, hidden = model.apply({"params": params}, x, sigma, modality=modality,
                            return_hidden=True)

    from unidisc_tpu.sampling.t2i_fast import _sigma_cond
    c = _sigma_cond(params, sigma)

    factored = _img_head(params, hidden[:, TXT:], c, config,
                         m.text_vocab_size)
    np.testing.assert_allclose(
        np.asarray(factored, np.float32),
        np.asarray(full[:, TXT:, m.text_vocab_size:], np.float32),
        atol=2e-4, rtol=1e-4)


def test_t2i_sampler_generates_valid_images():
    config = cfg(**{"sampling.cfg": 1.5})
    m = config.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    sample = jax.jit(build_t2i_sampler(model, config))
    txt = jnp.asarray(np.random.RandomState(0).randint(
        0, m.text_vocab_size - 1, (B, TXT)), jnp.int32)
    out = sample(params, jax.random.PRNGKey(1), txt)
    tokens = np.asarray(out.tokens)
    np.testing.assert_array_equal(tokens[:, :TXT], np.asarray(txt))
    assert (tokens[:, TXT:] >= m.text_vocab_size).all()
    assert (tokens[:, TXT:] < m.vocab_size).all()
    # noise-removal pass skipped when the schedule unmasked everything
    assert int(out.nfe) in (config.sampling.steps,
                            config.sampling.steps + 1)


def test_dilated_unmasking_schedule():
    """Dilated maskgit (PAPERS.md 'Plan for Speed'): in every restricted
    step all newly revealed image tokens share one dilated 2D group
    (>= d apart in both grid axes), and sampling still completes."""
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler as _build

    d = 2
    config = cfg(**{"sampling.maskgit_dilation": d,
                    "sampling.steps": 8})
    m = config.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    sample = jax.jit(_build(model, config, return_trajectory=True))
    txt = jnp.zeros((2, m.txt_length), jnp.int32)
    out, traj = sample(params, jax.random.PRNGKey(3), txt)
    toks = np.asarray(out.tokens)
    assert (toks[:, m.txt_length:] != m.mask_index).all()

    side = int(round(m.img_length ** 0.5))
    rr, cc = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    group = ((rr % d) * d + (cc % d)).reshape(-1)
    traj = np.asarray(traj)  # (steps, B, L)
    steps, n_groups = traj.shape[0], d * d
    prev = np.full_like(traj[0][:, m.txt_length:], m.mask_index)
    for i in range(steps):
        img = traj[i][:, m.txt_length:]
        new = (prev == m.mask_index) & (img != m.mask_index)
        if i < steps - n_groups:  # restricted steps
            for b in range(new.shape[0]):
                gs = np.unique(group[new[b]])
                assert len(gs) <= 1, (i, b, gs)
                if len(gs) == 1:
                    assert gs[0] == i % n_groups
        prev = img


def test_cfg_zero_weight_skips_uncond_and_matches_no_cfg():
    """When the guidance window zeroes w(t) the uncond trunk pass is
    skipped (lax.cond); cfg=0.0 zeroes every step, so the result must be
    token-identical to sampling with CFG off entirely."""
    config_on = cfg(**{"sampling.cfg": 0.0})
    config_off = cfg(**{"sampling.cfg": None})
    m = config_on.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    txt = jnp.zeros((2, m.txt_length), jnp.int32)
    rng = jax.random.PRNGKey(7)
    toks_on = np.asarray(jax.jit(build_t2i_sampler(model, config_on))(
        params, rng, txt).tokens)
    toks_off = np.asarray(jax.jit(build_t2i_sampler(model, config_off))(
        params, rng, txt).tokens)
    np.testing.assert_array_equal(toks_on, toks_off)


def test_cfg_window_weights_respected():
    """The fast path honors cfg_min/max_timestep windows via
    guidance_weight (reference model_eval.py:1737-1759) — windowed
    sampling differs from plain annealed CFG."""
    base = cfg(**{"sampling.cfg": 5.0})
    windowed = cfg(**{"sampling.cfg": 5.0,
                      "sampling.cfg_min_timestep": 0.1,
                      "sampling.cfg_max_timestep": 0.6})
    m = base.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    txt = jnp.zeros((2, m.txt_length), jnp.int32)
    rng = jax.random.PRNGKey(9)
    a = np.asarray(jax.jit(build_t2i_sampler(model, base))(
        params, rng, txt).tokens)
    b = np.asarray(jax.jit(build_t2i_sampler(model, windowed))(
        params, rng, txt).tokens)
    assert (a != b).any()


def _run_t2i(config, seed=0, **build_kw):
    m = config.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    sample = jax.jit(build_t2i_sampler(model, config, **build_kw))
    txt = jnp.asarray(np.random.RandomState(seed).randint(
        0, m.text_vocab_size - 1, (B, TXT)), jnp.int32)
    out = sample(params, jax.random.PRNGKey(seed), txt)
    return txt, out


def test_cached_cond_refresh1_matches_uncached_exactly():
    """cond_refresh=1 runs cache_full every step: same trunk math
    (cache-write + full-attention read over identical values), same
    factored head, same RNG stream — tokens must match the uncached
    sampler bit-for-bit."""
    config = cfg(**{"sampling.cfg": 1.5})
    txt, plain = _run_t2i(config)
    txt2, cached = _run_t2i(config, cached_cond=True, cond_refresh=1)
    np.testing.assert_array_equal(np.asarray(plain.tokens),
                                  np.asarray(cached.tokens))


def test_cached_cond_frozen_text_kv_completes():
    """cond_refresh=0: text K/V cached at step 0, every denoise step is
    image-rows-only. Output must be fully unmasked, respect the prompt,
    and stay in the image vocab."""
    for cfg_over in ({}, {"sampling.cfg": 1.5}):
        config = cfg(**cfg_over)
        m = config.model
        txt, out = _run_t2i(config, cached_cond=True, cond_refresh=0)
        tokens = np.asarray(out.tokens)
        assert not (tokens == m.mask_index).any()
        np.testing.assert_array_equal(tokens[:, :TXT], np.asarray(txt))
        assert (tokens[:, TXT:] >= m.text_vocab_size).all()
        assert (tokens[:, TXT:] < m.vocab_size).all()


def test_cached_cond_int8_kv_cache():
    config = cfg(**{"sampling.cfg": 1.5, "model.kv_cache_dtype": "int8"})
    m = config.model
    txt, out = _run_t2i(config, cached_cond=True, cond_refresh=0)
    tokens = np.asarray(out.tokens)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :TXT], np.asarray(txt))


def test_frozen_step_matches_cache_step_math():
    """The frozen (read-only concat) path and the write-back kv_cache path
    compute the same attention over [txt K/V || fresh img K/V] — raw
    log-weights must agree to float tolerance on the same state."""
    from unidisc_tpu.diffusion.noise import get_noise
    from unidisc_tpu.sampling.t2i_fast import img_log_weights_cached_fn

    config = cfg(**{"sampling.cfg": 1.5})
    m = config.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    cache_full, cache_step, frozen_txt_kv, frozen_step = \
        img_log_weights_cached_fn(model, config)

    rng = np.random.RandomState(0)
    txt = jnp.asarray(rng.randint(0, m.text_vocab_size - 1, (B, TXT)),
                      jnp.int32)
    x0 = jnp.concatenate(
        [txt, jnp.full((B, IMG), m.mask_index, jnp.int32)], -1)
    modality = jnp.concatenate([jnp.zeros((B, TXT), jnp.int32),
                                jnp.ones((B, IMG), jnp.int32)], -1)
    t0 = jnp.full((B,), 1.0)
    raw0, kv = jax.jit(cache_full)(params, x0, t0, modality, None)
    frozen = frozen_txt_kv(kv)

    # a later state: some image tokens revealed
    x1 = x0.at[:, TXT + 3].set(m.text_vocab_size + 5)
    t1 = jnp.full((B,), 0.6)
    raw_cache, _ = jax.jit(cache_step)(params, x1, t1, modality, kv)
    raw_frozen = jax.jit(frozen_step)(params, x1, t1, modality, frozen)
    np.testing.assert_allclose(np.asarray(raw_frozen),
                               np.asarray(raw_cache), atol=2e-3, rtol=2e-3)
