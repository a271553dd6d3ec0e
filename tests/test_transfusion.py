"""Transfusion/continuous-mode tests (reference: model_eval.py:2542-2628,
models/dit.py:102-120)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.continuous import TransfusionDIT, transfusion_mask
from unidisc_tpu.sampling.continuous import (build_continuous_sampler,
                                             continuous_image_loss,
                                             cosine_alpha_bar)

B, TXT, IMG, LD = 2, 8, 16, 8
L = TXT + IMG


def cfg():
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": TXT, "model.img_length": IMG,
        "model.text_vocab_size": 32, "model.image_vocab_size": 0,
        "model.time_conditioning": True, "model.dropout": 0.0,
        "model.full_attention": True})


def modality():
    return jnp.concatenate([jnp.zeros((B, TXT), jnp.int32),
                            jnp.ones((B, IMG), jnp.int32)], -1)


def test_transfusion_mask_semantics():
    mod = modality()
    mask = np.asarray(transfusion_mask(B, L, TXT, mod))
    # text query attends causally only
    assert mask[0, 2, 1] and not mask[0, 2, 3]
    # image query attends to future image keys (bidirectional block)
    assert mask[0, TXT, L - 1]
    # image query attends to past text
    assert mask[0, TXT + 1, 0]
    # text query never attends to image
    assert not mask[0, TXT - 1, TXT]
    # text-only rows are pure causal
    mod2 = jnp.zeros((B, L), jnp.int32)
    mask2 = np.asarray(transfusion_mask(B, L, TXT, mod2))
    assert not mask2[0, TXT, L - 1]


def test_transfusion_dit_forward():
    config = cfg()
    model = TransfusionDIT(config.model, latent_dim=LD)
    ids = jnp.zeros((B, L), jnp.int32)
    latents = jax.random.normal(jax.random.PRNGKey(1), (B, L, LD))
    mod = modality()
    mask = transfusion_mask(B, L, TXT, mod)
    params = model.init(jax.random.PRNGKey(0), ids, latents,
                        jnp.zeros((B,)), mod, mask)["params"]
    logits, latent_pred = model.apply({"params": params}, ids, latents,
                                      jnp.zeros((B,)), mod, mask)
    assert logits.shape == (B, L, config.model.vocab_size)
    assert latent_pred.shape == (B, L, LD)
    # latents influence the prediction
    logits2, pred2 = model.apply({"params": params}, ids, latents * 2,
                                 jnp.zeros((B,)), mod, mask)
    assert np.abs(np.asarray(pred2 - latent_pred)).max() > 1e-5


def test_ddim_sampler_recovers_oracle_latent():
    config = cfg().override(**{"sampling.steps": 24})
    target = jax.random.normal(jax.random.PRNGKey(3), (B, L, LD))
    mod = modality()
    target = target * (mod == 1)[..., None]

    def oracle_apply(params, ids, z, sigma, modality, mask):
        return None, target  # perfect x0 predictor

    sample = jax.jit(build_continuous_sampler(oracle_apply, config,
                                              latent_dim=LD))
    z = sample({}, jax.random.PRNGKey(0), jnp.zeros((B, L), jnp.int32), mod)
    # DDIM with a perfect x0 predictor converges to the target latent
    np.testing.assert_allclose(np.asarray(z), np.asarray(target), atol=0.15)


def test_continuous_loss():
    mod = modality()
    pred = jnp.ones((B, L, LD))
    tgt = jnp.zeros((B, L, LD))
    loss = continuous_image_loss(pred, tgt, mod)
    np.testing.assert_allclose(float(loss), 1.0, rtol=1e-6)
    # alpha_bar monotone decreasing
    ts = jnp.linspace(0, 1, 10)
    ab = np.asarray(cosine_alpha_bar(ts))
    assert (np.diff(ab) < 0).all()
