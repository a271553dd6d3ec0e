"""AR decode tests: KV-cache decode must match the full causal forward
token-for-token (reference KV cache: models/dit.py:588-608; AR sampler:
model_eval.py:2736-2822)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.ar_sampler import (build_ar_sampler, init_kv_cache,
                                             make_apply_token)

B, L = 2, 24
TXT = 8


def ar_config(**over):
    cfg = Config.make("tiny")
    return cfg.override(**{
        "model.length": L,
        "model.txt_length": TXT,
        "model.img_length": L - TXT,
        "model.text_vocab_size": 20,
        "model.image_vocab_size": 20,
        "model.full_attention": False,  # causal
        "model.dropout": 0.0,
        "trainer.parameterization": "ar",
        **over})


def make_inputs(cfg):
    m = cfg.model
    rng = np.random.RandomState(0)
    txt = rng.randint(0, m.text_vocab_size - 1, (B, TXT))
    img = rng.randint(m.text_vocab_size, m.vocab_size, (B, L - TXT))
    x = jnp.asarray(np.concatenate([txt, img], 1), jnp.int32)
    modality = jnp.asarray(
        np.concatenate([np.zeros((B, TXT)), np.ones((B, L - TXT))], 1),
        jnp.int32)
    return x, modality


def test_kv_cache_decode_matches_full_forward():
    cfg = ar_config()
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    x, modality = make_inputs(cfg)
    sigma = jnp.zeros((B,), jnp.float32)

    full_logits = model.apply({"params": params}, x, sigma, modality=modality)

    apply_token = make_apply_token(model)
    kv = init_kv_cache(m.n_blocks, B, L, m.n_heads, m.head_dim)

    def body(kv, i):
        tok = jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)
        mod = jax.lax.dynamic_slice_in_dim(modality, i, 1, axis=1)
        logits, kv = apply_token(params, tok, kv, i, mod)
        return kv, logits[:, 0]

    _, step_logits = jax.lax.scan(body, kv, jnp.arange(L))
    step_logits = jnp.transpose(step_logits, (1, 0, 2))  # (B, L, V)

    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(full_logits), atol=2e-2, rtol=1e-2)


def test_ar_sampler_respects_conditioning_and_modality():
    cfg = ar_config(**{"model.force_argmax_valid_indices": True,
                       "sampling.temperature": 1.0})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    x0, modality = make_inputs(cfg)
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)

    sample = jax.jit(build_ar_sampler(make_apply_token(model), cfg))
    out = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)

    assert out.tokens.shape == (B, L)
    # prompt preserved
    assert (out.tokens[:, :TXT] == x0[:, :TXT]).all()
    # generated image tokens live in the image vocab slice
    gen = np.asarray(out.tokens[:, TXT:])
    assert (gen >= m.text_vocab_size).all() and (gen < m.vocab_size).all()
    assert not (np.asarray(out.tokens) == m.mask_index).any()
    assert int(out.nfe) == L - 1


def test_ar_sampler_cfg_runs():
    cfg = ar_config(**{"sampling.cfg": 1.5,
                       "model.force_argmax_valid_indices": True})
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    x0, modality = make_inputs(cfg)
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)
    sample = jax.jit(build_ar_sampler(make_apply_token(model), cfg))
    out = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)
    assert (out.tokens[:, :TXT] == x0[:, :TXT]).all()
    assert not (np.asarray(out.tokens) == cfg.model.mask_index).any()


def test_ar_sampler_is_stochastic():
    """Gumbel-argmax must draw per-vocab noise — a per-row scalar broadcast
    over the vocab axis is a no-op (argmax(l + c) == argmax(l)) and decoding
    silently degenerates to greedy. Different seeds must differ."""
    cfg = ar_config(**{"sampling.temperature": 2.0})
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    x0, modality = make_inputs(cfg)
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)
    sample = jax.jit(build_ar_sampler(make_apply_token(model), cfg))
    out1 = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)
    out2 = sample(params, jax.random.PRNGKey(2), x0, x0_unmask, modality)
    assert (np.asarray(out1.tokens) != np.asarray(out2.tokens)).any()
    # same seed stays deterministic
    out1b = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)
    np.testing.assert_array_equal(np.asarray(out1.tokens),
                                  np.asarray(out1b.tokens))


def test_ar_sampler_nucleus_runs():
    cfg = ar_config(**{"sampling.top_p": 0.9})
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    x0, modality = make_inputs(cfg)
    x0_unmask = jnp.zeros((B, L), bool).at[:, :TXT].set(True)
    sample = jax.jit(build_ar_sampler(make_apply_token(model), cfg))
    out = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)
    assert out.tokens.shape == (B, L)


def test_temperature_zero_is_greedy():
    """temperature=0 must decode greedily (review fix: logits/0 produced
    +-inf and argmax picked arbitrary tokens)."""
    cfg0 = ar_config(**{"sampling.temperature": 0.0,
                        "sampling.cfg": None})
    model, params = init_dit(jax.random.PRNGKey(0), cfg0.model)
    apply_token = make_apply_token(model)
    sample = jax.jit(build_ar_sampler(apply_token, cfg0))
    b, l = 2, cfg0.model.length
    x0 = jnp.zeros((b, l), jnp.int32)
    unmask = jnp.zeros((b, l), bool).at[:, :4].set(True)
    out1 = np.asarray(sample(params, jax.random.PRNGKey(1), x0, unmask).tokens)
    out2 = np.asarray(sample(params, jax.random.PRNGKey(2), x0, unmask).tokens)
    # greedy: independent of the rng
    np.testing.assert_array_equal(out1, out2)
    assert (out1 < cfg0.model.vocab_size).all() and (out1 >= 0).all()


def test_temperature_zero_with_top_p_is_greedy():
    """temperature=0 means greedy decode even with top_p set (the
    zero-temperature limit of nucleus sampling is the argmax, not
    temperature-1 nucleus draws)."""
    cfg = ar_config(**{"sampling.temperature": 0.0,
                       "sampling.top_p": 0.9, "sampling.cfg": None})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    x0, modality = make_inputs(cfg)
    x0_unmask = jnp.zeros((B, L), bool).at[:, :4].set(True)
    sample = jax.jit(build_ar_sampler(make_apply_token(model), cfg))
    a = sample(params, jax.random.PRNGKey(1), x0, x0_unmask, modality)
    b = sample(params, jax.random.PRNGKey(999), x0, x0_unmask, modality)
    # rng must not matter at temperature 0
    np.testing.assert_array_equal(np.asarray(a.tokens),
                                  np.asarray(b.tokens))
