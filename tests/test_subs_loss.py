"""Golden tests for SUBS parameterization and NELBO loss
(reference semantics: model.py:621-658, 960-1173)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.diffusion import (LogLinearNoise, diffusion_loss,
                                   nelbo_weighting, subs_parameterization)

MASK = 5
VOCAB = 8
TEXT_VOCAB = 6  # ids 0..5 text (5 = mask), 6..7 image


def test_subs_zero_mask_prob():
    logits = jnp.zeros((1, 4, VOCAB))
    xt = jnp.full((1, 4), MASK)
    lp = subs_parameterization(logits, xt, MASK)
    probs = np.asarray(jnp.exp(lp))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(probs[..., MASK], 0.0, atol=1e-9)
    # uniform over remaining vocab
    np.testing.assert_allclose(probs[..., 0], 1.0 / (VOCAB - 1), rtol=1e-4)


def test_subs_carry_over():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 3, VOCAB))
    xt = jnp.array([[0, MASK, 2], [MASK, 1, MASK]])
    lp = subs_parameterization(logits, xt, MASK)
    probs = np.asarray(jnp.exp(lp))
    # unmasked positions are deltas at xt
    np.testing.assert_allclose(probs[0, 0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(probs[0, 2, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(probs[1, 1, 1], 1.0, atol=1e-6)
    # masked positions remain proper distributions without mask prob
    np.testing.assert_allclose(probs[0, 1].sum(), 1.0, rtol=1e-4)
    assert probs[0, 1, MASK] < 1e-9


def test_subs_modality_restriction():
    logits = jnp.zeros((1, 2, VOCAB))
    xt = jnp.full((1, 2), MASK)
    modality = jnp.array([[0, 1]])  # pos0 text, pos1 image
    lp = subs_parameterization(logits, xt, MASK, modality=modality,
                               text_vocab_size=TEXT_VOCAB)
    probs = np.asarray(jnp.exp(lp))
    # text position: no image-vocab mass
    np.testing.assert_allclose(probs[0, 0, TEXT_VOCAB:], 0.0, atol=1e-9)
    # image position: no text-vocab mass
    np.testing.assert_allclose(probs[0, 1, :TEXT_VOCAB], 0.0, atol=1e-9)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)


def test_nelbo_weighting_golden():
    n = LogLinearNoise(eps=1e-3)
    t = jnp.array([0.3])
    sigma, dsigma = n.total(t), n.rate(t)
    w = np.asarray(nelbo_weighting(sigma, dsigma))
    # loglinear identity: dsigma/expm1(sigma) = 1/t  (since expm1(sigma) =
    # (1-eps)t/(1-(1-eps)t) and dsigma = (1-eps)/(1-(1-eps)t))
    np.testing.assert_allclose(w, 1.0 / 0.3, rtol=1e-3)
    w5 = np.asarray(nelbo_weighting(sigma, dsigma, softmin_snr=5.0))
    assert w5 < w  # softmin caps the weight


def test_diffusion_loss_hand_computed():
    # 1 sample, 2 tokens, uniform prediction over 7 non-mask ids
    logits = jnp.zeros((1, 2, VOCAB))
    xt = jnp.full((1, 2), MASK)
    x0 = jnp.array([[1, 2]])
    lp = subs_parameterization(logits, xt, MASK)
    n = LogLinearNoise(eps=1e-3)
    t = jnp.array([0.5])
    sigma, dsigma = n.total(t), n.rate(t)
    out = diffusion_loss(lp, x0, sigma, dsigma)
    expected = np.log(VOCAB - 1) * float((dsigma / jnp.expm1(sigma))[0])
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-3)


def test_diffusion_loss_modality_split():
    logits = jnp.zeros((2, 4, VOCAB))
    xt = jnp.full((2, 4), MASK)
    x0 = jnp.array([[1, 2, 6, 7], [0, 1, 6, 6]])
    modality = jnp.array([[0, 0, 1, 1], [0, 0, 1, 1]])
    lp = subs_parameterization(logits, xt, MASK, modality=modality,
                               text_vocab_size=TEXT_VOCAB)
    n = LogLinearNoise()
    t = jnp.array([0.5, 0.5])
    sigma, dsigma = n.total(t), n.rate(t)
    out = diffusion_loss(lp, x0, sigma, dsigma, modality=modality,
                         text_loss_weight=1.0, img_loss_weight=0.6)
    w = float(nelbo_weighting(sigma, dsigma)[0])
    # text: uniform over 5 valid ids (text vocab minus mask), frac 0.5
    txt_expected = np.log(TEXT_VOCAB - 1) * w * 0.5 * 1.0
    img_expected = np.log(VOCAB - TEXT_VOCAB) * w * 0.5 * 0.6
    np.testing.assert_allclose(float(out.txt_loss), txt_expected, rtol=1e-3)
    np.testing.assert_allclose(float(out.img_loss), img_expected, rtol=1e-3)
    np.testing.assert_allclose(float(out.loss), txt_expected + img_expected, rtol=1e-3)


def test_loss_batch_ignore_mask():
    logits = jnp.zeros((2, 3, VOCAB))
    xt = jnp.full((2, 3), MASK)
    x0 = jnp.zeros((2, 3), jnp.int32)
    lp = subs_parameterization(logits, xt, MASK)
    n = LogLinearNoise()
    t = jnp.array([0.5, 0.5])
    out = diffusion_loss(lp, x0, n.total(t), n.rate(t),
                         batch_ignore=jnp.array([True, False]))
    mask = np.asarray(out.token_mask)
    assert not mask[0].any() and mask[1].all()
