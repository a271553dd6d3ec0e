"""Scoring battery tests (reference: demo/scoring/* — generate inputs,
sweep the model over conditioning modes, score with rewards, analyze)."""

import json

import jax
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.eval.scoring import (MODES, analyze_rewards, call_model,
                                      generate_input, generate_rewards,
                                      mask_caption_spans, random_rect_mask)
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.serving.engine import InferenceEngine
from unidisc_tpu.tokenizers.image_codecs import get_codec


def scoring_engine():
    cfg = Config.make("tiny").override(**{
        "model.text_vocab_size": 261,
        "model.image_vocab_size": 64,
        "model.length": 32,
        "model.txt_length": 16,
        "model.img_length": 16,   # 4x4 grid
        "model.force_argmax_valid_indices": True,
        "model.dropout": 0.0,
        "sampling.steps": 2,
        "sampling.predictor": "maskgit",
    })
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    codec = get_codec("dummy", image_size=64, vocab=64)
    return InferenceEngine(cfg, model, params, codec=codec)


def test_generate_input_layout(tmp_path):
    generate_input(tmp_path / "in", num_pairs=3, image_size=64, seed=1)
    dirs = sorted((tmp_path / "in").iterdir())
    assert len(dirs) == 3
    for d in dirs:
        assert (d / "image.png").exists()
        caption = (d / "caption.txt").read_text()
        assert "background" in caption
        assert (d / "mask_caption.txt").exists()
        assert (d / "mask.png").exists()


def test_mask_caption_spans_contract():
    rng = np.random.default_rng(0)
    cap = "a red square on a blue background"
    masked = mask_caption_spans(cap, rng)
    assert "<mask>" in masked
    assert len(masked.split()) == len(cap.split())


def test_random_rect_mask():
    m = random_rect_mask(np.random.default_rng(0), 64)
    assert m.shape == (64, 64) and m.any() and not m.all()


def test_battery_end_to_end(tmp_path):
    eng = scoring_engine()
    generate_input(tmp_path / "in", num_pairs=2, image_size=64, seed=0)
    written = call_model(tmp_path / "in", tmp_path / "gen", eng,
                         num_pairs=2, seed=0)
    assert len(written) == 2 * len(MODES)
    for d in written:
        assert (d / "image.png").exists()
        assert (d / "caption.txt").exists()
        assert json.loads((d / "config.json").read_text())["mode"] in MODES

    results = generate_rewards(tmp_path / "gen", tmp_path / "rewards.json",
                               eng, batch_size=4)
    assert len(results) == len(written)
    first = next(iter(results.values()))
    assert set(first["rewards"]) == {"model_likelihood", "token_entropy",
                                     "image_diversity"}
    assert all(np.isfinite(v) for v in first["rewards"].values())

    out = analyze_rewards(tmp_path / "rewards.json",
                          output_file=tmp_path / "summary.json")
    assert set(out["summary"]) == set(MODES)
    assert len(out["ranking"]) == len(MODES)
    # every mode aggregated over both pairs
    for mode in out["summary"].values():
        assert all(s["n"] == 2 for s in mode["rewards"].values())
