"""Legacy parameterizations + extra samplers tests
(reference: model_utils.py SEDD/D3PM/semi-AR; model_eval.py Tweedie)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.legacy import (d3pm_loss, d3pm_parameterization,
                                          get_score, score_entropy,
                                          sedd_parameterization)
from unidisc_tpu.sampling.extras import (build_analytic_sampler,
                                         build_semi_ar_sampler,
                                         build_tweedie_sampler)

V, MASK = 12, 11
B, L = 3, 10


def oracle_forward(target, vocab):
    def fn(params, x, sigma, modality):
        reps = x.shape[0] // target.shape[0]
        return 50.0 * jnp.tile(jax.nn.one_hot(target, vocab), (reps, 1, 1))
    return fn


def base_cfg(**over):
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": L, "model.img_length": 0,
        "model.text_vocab_size": V, "model.image_vocab_size": 0,
        "sampling.steps": 12, **over})


def test_sedd_parameterization_zero_at_xt():
    logits = jnp.asarray(np.random.RandomState(0).randn(B, L, V),
                         jnp.float32)
    xt = jnp.asarray(np.random.RandomState(1).randint(0, V, (B, L)))
    sigma = jnp.asarray([0.5, 1.0, 2.0])
    out = sedd_parameterization(logits, xt, sigma)
    picked = jnp.take_along_axis(out, xt[..., None], -1).squeeze(-1)
    np.testing.assert_allclose(np.asarray(picked), 0.0, atol=1e-6)


def test_d3pm_parameterization_normalized():
    logits = jnp.asarray(np.random.RandomState(0).randn(B, L, V))
    out = d3pm_parameterization(logits)
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(-1)), 1.0,
                               rtol=1e-5)
    out_m = d3pm_parameterization(logits, mask_index=MASK)
    assert (np.asarray(out_m[..., MASK]) < -100).all()


def test_score_entropy_zero_on_unmasked():
    log_score = jnp.zeros((B, L, V))
    sigma = jnp.ones((B,))
    x0 = jnp.zeros((B, L), jnp.int32)
    xt = x0  # nothing masked
    ent = score_entropy(log_score, sigma, xt, x0, MASK)
    np.testing.assert_allclose(np.asarray(ent), 0.0)
    xt2 = jnp.full((B, L), MASK)
    ent2 = score_entropy(log_score, sigma, xt2, x0, MASK)
    assert np.isfinite(np.asarray(ent2)).all()
    assert (np.asarray(ent2) != 0).all()


def test_d3pm_loss_masked_only():
    model_output = jax.nn.log_softmax(
        jnp.asarray(np.random.RandomState(0).randn(B, L, V)), -1)
    x0 = jnp.asarray(np.random.RandomState(1).randint(0, V - 1, (B, L)))
    xt = x0.at[:, :4].set(MASK)
    t = jnp.asarray([0.3, 0.5, 0.9])
    loss = d3pm_loss(model_output, xt, x0, t, T=100, mask_index=MASK)
    assert np.isfinite(np.asarray(loss)).all()
    assert (np.asarray(loss[:, 4:]) == 0).all()
    assert (np.abs(np.asarray(loss[:, :4])) > 0).any()


def test_get_score_semantics():
    log_p = jax.nn.log_softmax(
        jnp.asarray(np.random.RandomState(0).randn(B, L, V)), -1)
    sigma = jnp.asarray([0.5, 1.0, 2.0])
    x = jnp.full((B, L), MASK).at[:, :3].set(1)
    score = get_score(log_p, x, sigma, MASK)
    # unmasked positions: score 1 at own token
    np.testing.assert_allclose(np.asarray(score[:, :3, 1]), 1.0, rtol=1e-5)
    # masked positions: score at mask = 1 (exp(0))
    np.testing.assert_allclose(np.asarray(score[:, 3:, MASK]), 1.0,
                               rtol=1e-5)


def test_analytic_sampler_recovers_oracle():
    cfg = base_cfg()
    tgt = jnp.asarray(np.random.RandomState(0).randint(0, V - 1, (B, L)))
    sample = jax.jit(build_analytic_sampler(oracle_forward(tgt, V), cfg))
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0),
                 jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), bool))
    assert not (np.asarray(out.tokens) == MASK).any()
    assert (np.asarray(out.tokens) == np.asarray(tgt)).mean() > 0.95


def test_semi_ar_sampler():
    cfg = base_cfg()
    tgt = jnp.asarray(np.random.RandomState(0).randint(0, V - 1, (B, L)))
    sample = build_semi_ar_sampler(oracle_forward(tgt, V), cfg,
                                   stride_length=4, num_strides=2,
                                   steps_per_stride=8)
    out = sample(jnp.zeros(0), jax.random.PRNGKey(0), B)
    # output = num_strides*stride + final window
    assert out.tokens.shape == (B, 2 * 4 + L)
    assert not (np.asarray(out.tokens) == MASK).any()
    assert int(out.nfe) > 0


def test_tweedie_sampler_maximizes_reward():
    cfg = base_cfg(**{"sampling.steps": 16})
    rng = np.random.RandomState(0)
    tgt = jnp.asarray(rng.randint(0, V - 1, (B, L)))

    def soft_forward(params, x, sigma, modality):
        # weakly-peaked oracle: candidates vary, reward should steer
        return 2.0 * jax.nn.one_hot(tgt, V)

    def reward_even_tokens(tokens):
        return (tokens % 2 == 0).mean(axis=-1)

    guided = jax.jit(build_tweedie_sampler(soft_forward, cfg,
                                           reward_even_tokens,
                                           n_candidates=8))
    plain = jax.jit(build_tweedie_sampler(soft_forward, cfg,
                                          lambda t: jnp.zeros(t.shape[0]),
                                          n_candidates=1))
    out_g = guided(jnp.zeros(0), jax.random.PRNGKey(1),
                   jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), bool))
    out_p = plain(jnp.zeros(0), jax.random.PRNGKey(1),
                  jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), bool))
    frac_even_g = float((np.asarray(out_g.tokens) % 2 == 0).mean())
    frac_even_p = float((np.asarray(out_p.tokens) % 2 == 0).mean())
    assert frac_even_g > frac_even_p
