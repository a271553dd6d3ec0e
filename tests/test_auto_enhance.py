"""Auto-enhance tests (reference: model_eval.py:3729-3970)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.eval.auto_enhance import build_auto_enhance, partial_remask
from unidisc_tpu.sampling.sampler import SampleResult

B, TXT, IMG = 4, 16, 32
L = TXT + IMG
V = 40


def cfg():
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": TXT, "model.img_length": IMG,
        "model.text_vocab_size": 20, "model.image_vocab_size": 20})


def test_partial_remask_rates():
    keep = partial_remask(jax.random.PRNGKey(0), 256, TXT, IMG)
    assert keep.shape == (256, L)
    txt_mask_rate = 1 - np.asarray(keep[:, :TXT]).mean()
    img_mask_rate = 1 - np.asarray(keep[:, TXT:]).mean()
    # ~0.85 txt / ~0.95 img masking (reference rates)
    assert 0.75 < txt_mask_rate < 0.95
    assert 0.88 < img_mask_rate < 1.0
    assert img_mask_rate > txt_mask_rate


def test_auto_enhance_only_improves():
    config = cfg()

    def fake_sampler(params, rng, x0, x0_unmask, modality):
        # regenerated tokens are random; kept tokens preserved
        new = jax.random.randint(rng, x0.shape, 0, V)
        return SampleResult(tokens=jnp.where(x0_unmask, x0, new),
                            nfe=jnp.int32(1))

    def reward_even(tokens):
        return (tokens % 2 == 0).mean(axis=-1)

    enhance = jax.jit(build_auto_enhance(fake_sampler, config, reward_even,
                                         n_candidates=6))
    tokens = jnp.asarray(
        np.random.RandomState(0).randint(0, V, (B, L)), jnp.int32)
    best, rewards = enhance({}, jax.random.PRNGKey(1), tokens,
                            jnp.zeros((B, L), jnp.int32))
    base = np.asarray(reward_even(tokens))
    improved = np.asarray(reward_even(best))
    # never worse than the original (original is a candidate)
    assert (improved >= base - 1e-6).all()
    # with 6 random candidates, at least one element should improve
    assert (improved > base).any()
    assert rewards.shape == (7, B)
