"""Tests for the auxiliary battery: interleaved text tokenizer, device
prefetcher, viz, reward registry, dist helpers, fault injection."""

import os

import jax
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.data.interleaved import pack_documents
from unidisc_tpu.data.prefetch import DevicePrefetcher
from unidisc_tpu.data.synthetic import SyntheticDataLoader
from unidisc_tpu.eval.rewards import combine, get_scorer
from unidisc_tpu.tokenizers.interleaved_text import tokenize_interleaved
from unidisc_tpu.tokenizers.text import ByteTokenizer
from unidisc_tpu.utils.dist import (barrier, host_local_batch_size,
                                    is_main_process, rprint)
from unidisc_tpu.utils.viz import image_grid, save_image_grid, token_heatmap


def test_tokenize_interleaved():
    tok = ByteTokenizer()
    doc = tokenize_interleaved(
        "caption one <image> middle <image> end",
        [np.arange(16), np.arange(16, 32)], tok, text_vocab_size=261,
        grid=4)
    kinds = [s.kind for s in doc.segments]
    assert kinds == ["text", "image", "text", "image", "text"]
    # image ids offset into unified vocab
    assert doc.segments[1].ids.min() >= 261
    # packs cleanly
    batch = pack_documents([doc], length=96, pad_id=0, eos_id=2)
    assert (batch["sample_ids"] == 0).sum() == len(doc) + 1  # +EOS


def test_tokenize_interleaved_slot_mismatch():
    tok = ByteTokenizer()
    with pytest.raises(AssertionError, match="slots"):
        tokenize_interleaved("a <image> b", [], tok, text_vocab_size=261)


def test_device_prefetcher():
    cfg = Config.make("tiny")
    loader = SyntheticDataLoader(cfg, batch_size=4)
    pf = DevicePrefetcher(loader, depth=2)
    b1 = next(pf)
    b2 = next(pf)
    assert isinstance(b1["input_ids"], jax.Array)
    assert b1["input_ids"].shape == (4, cfg.model.length)
    assert not np.array_equal(np.asarray(b1["input_ids"]),
                              np.asarray(b2["input_ids"]))
    assert "step" in pf.state_dict()
    pf.close()


def test_viz_grid(tmp_path):
    imgs = np.random.RandomState(0).uniform(-1, 1, (5, 8, 8, 3))
    grid = image_grid(imgs)
    assert grid.dtype == np.uint8
    assert grid.shape == (2 * 8 + 2, 3 * 8 + 2 * 2, 3)
    path = save_image_grid(imgs, str(tmp_path / "g.png"))
    assert os.path.exists(path)
    hm = token_heatmap(np.arange(32), vocab_size=64, grid=4)
    assert hm.shape == (2, 4, 4, 3)


def test_reward_registry():
    ent = get_scorer("token_entropy", vocab_size=16)
    div = get_scorer("image_diversity")
    uniform = {"input_ids": np.tile(np.arange(16), (2, 4)),
               "image_ids": np.tile(np.arange(16), (2, 2))}
    constant = {"input_ids": np.zeros((2, 64), int),
                "image_ids": np.zeros((2, 32), int)}
    assert (ent(uniform) > ent(constant)).all()
    assert (div(uniform) > div(constant)).all()
    mix = combine([ent, div], [1.0, 2.0])
    np.testing.assert_allclose(mix(uniform),
                               ent(uniform) + 2 * div(uniform))
    clip = get_scorer("clip")
    with pytest.raises(RuntimeError, match="judge weights"):
        clip(uniform)
    with pytest.raises(KeyError):
        get_scorer("nope")


def test_dist_helpers_single_host():
    assert is_main_process()
    rprint("rank0 print ok")
    barrier("test")  # no-op single host
    assert host_local_batch_size(32) == 32
    with pytest.raises(AssertionError):
        host_local_batch_size(7) if jax.process_count() > 1 else \
            (_ for _ in ()).throw(AssertionError)


def test_fault_injection_and_restart(tmp_path):
    from unidisc_tpu.training.trainer import Trainer
    cfg = Config.make("tiny").override(**{
        "model.time_conditioning": True, "trainer.warmup_steps": 2,
        "model.dropout": 0.0})
    run = str(tmp_path / "run")
    tr = Trainer(cfg, run, ckpt_every=100, throw_failure_at=5)
    loader = SyntheticDataLoader(cfg, batch_size=8)
    with pytest.raises(RuntimeError, match="injected failure"):
        tr.fit(loader, max_steps=20)
    tr.close()
    # restart resumes from the forced checkpoint at the failure step
    tr2 = Trainer(cfg, run, ckpt_every=100)
    loader2 = SyntheticDataLoader(cfg, batch_size=8)
    out = tr2.fit(loader2, max_steps=8)
    assert out["step"] == 8
    tr2.close()


def test_config_validate():
    """Flag-legality checks (reference _validate_configuration,
    model_setup.py:435-470)."""
    import pytest

    from unidisc_tpu.config import Config

    Config.make("tiny").validate()  # defaults are legal
    with pytest.raises(ValueError, match="n_heads"):
        Config.make("tiny").override(**{"model.hidden_size": 65}).validate()
    with pytest.raises(ValueError, match="full_attention"):
        Config.make("tiny").override(**{
            "trainer.parameterization": "ar",
            "trainer.ar_shift": True}).validate()
    with pytest.raises(ValueError, match="square"):
        Config.make("tiny").override(**{
            "model.length": 40, "model.txt_length": 20,
            "model.img_length": 20,
            "sampling.maskgit_dilation": 2}).validate()
    with pytest.raises(ValueError, match="lr_schedule"):
        Config.make("tiny").override(**{
            "trainer.lr_schedule": "nope"}).validate()
    with pytest.raises(ValueError, match="length"):
        Config.make("tiny").override(**{"model.length": 999}).validate()
    # AR configured correctly passes
    Config.make("tiny").override(**{
        "trainer.parameterization": "ar", "trainer.ar_shift": True,
        "model.full_attention": False}).validate()
