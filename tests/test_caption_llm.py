"""Caption augmentation tests (reference: unidisc/utils/simple_llm.py and
the augmented-caption battery in model_eval.py:3755-3800)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.eval.auto_enhance import build_caption_enhance
from unidisc_tpu.sampling.sampler import SampleResult
from unidisc_tpu.tokenizers.text import get_tokenizer
from unidisc_tpu.utils.caption_llm import (
    augment_batch, get_caption_augmenter, procedural_negatives)

CAPTION = "a red sailboat on the blue ocean under one yellow sun"


def test_procedural_negatives_contract():
    out = procedural_negatives(CAPTION, n=12)
    assert len(out) == 12
    assert len(set(out)) == 12
    assert CAPTION not in out
    assert all(isinstance(c, str) and c for c in out)


def test_procedural_negatives_deterministic():
    assert procedural_negatives(CAPTION, 8, seed=3) == \
        procedural_negatives(CAPTION, 8, seed=3)
    assert procedural_negatives(CAPTION, 8, seed=3) != \
        procedural_negatives(CAPTION, 8, seed=4)


def test_procedural_negatives_half_broken():
    out = procedural_negatives(CAPTION, n=12)
    orig = set(CAPTION.split())
    # Plausible edits keep most words; broken ones mangle structure. At
    # least a third of outputs should differ structurally (word count or
    # heavy reordering), at least a third should be near-edits.
    def near(c):
        w = set(c.split())
        return len(orig & w) >= len(orig) - 2 and \
            abs(len(c.split()) - len(CAPTION.split())) <= 2 and \
            c.split() != sorted(c.split(), key=CAPTION.split().index)
    near_count = sum(
        len(orig & set(c.split())) >= len(orig) - 2 for c in out)
    assert near_count >= 4


def test_augmenter_factory():
    fn = get_caption_augmenter("procedural", n=5)
    caps, name = fn(CAPTION)
    assert name == "procedural" and len(caps) == 5
    with pytest.raises(NotImplementedError):
        get_caption_augmenter("api")
    with pytest.raises(ValueError):
        get_caption_augmenter("nope")


def test_ar_augmenter_uses_model_and_falls_back():
    tok = get_tokenizer("byte")

    def fake_sample(prompt_ids, n):
        # Two useful rows, rest empty -> procedural fallback fills to n.
        rows = np.full((n, 16), tok.pad_token_id, np.int32)
        for i, s in enumerate([b"blue boat", b"red dog"]):
            enc = tok.encode(s.decode(), add_bos=False, add_eos=False)[:16]
            rows[i, :len(enc)] = enc
        return rows

    fn = get_caption_augmenter("ar", sample_text_fn=fake_sample,
                               tokenizer=tok, n=6)
    caps, name = fn(CAPTION)
    assert name == "ar-elm" and len(caps) == 6
    assert "blue boat" in caps[0]


def test_augment_batch_shuffle_and_clip():
    fn = get_caption_augmenter("procedural", n=12)
    out = augment_batch(fn, [CAPTION, "a dog"], max_per_caption=5,
                        shuffle_seed=7)
    assert len(out) == 2 and all(len(v) == 5 for v in out)


def test_caption_enhance_driver():
    TXT, IMG = 24, 16
    config = Config.make("tiny").override(**{
        "model.length": TXT + IMG, "model.txt_length": TXT,
        "model.img_length": IMG, "model.text_vocab_size": 300,
        "model.image_vocab_size": 20})
    tok = get_tokenizer("byte")

    def fake_sampler(params, rng, x0, x0_unmask, modality):
        new = jax.random.randint(rng, x0.shape, 0, 300)
        return SampleResult(tokens=jnp.where(x0_unmask, x0, new),
                            nfe=jnp.int32(1))

    def reward_even(tokens):
        return (tokens % 2 == 0).mean(axis=-1)

    enhance = build_caption_enhance(
        fake_sampler, config, reward_even, tok,
        get_caption_augmenter("procedural", n=6), max_augmentations=4)
    txt = tok(["a red boat", "one green tree"],
              max_length=TXT)["input_ids"]
    tokens = jnp.concatenate([
        jnp.asarray(txt),
        jnp.asarray(np.random.RandomState(0).randint(300, 320, (2, IMG)))],
        -1).astype(jnp.int32)
    best, rewards, variants = enhance(
        {}, jax.random.PRNGKey(0), tokens, jnp.zeros_like(tokens))
    assert best.shape == tokens.shape
    assert rewards.shape[0] == 5  # original + 4 variants
    assert len(variants) == 2 and all(len(v) == 4 for v in variants)
    base = np.asarray(reward_even(tokens))
    assert (np.asarray(reward_even(best)) >= base - 1e-6).all()
