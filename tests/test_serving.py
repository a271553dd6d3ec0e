"""Serving tests: engine task routing and the HTTP endpoint end-to-end
(reference: demo/server.py:117-219; demo/inference.py:63-460)."""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.serving.engine import InferenceEngine, expand_mask_tokens
from unidisc_tpu.serving.server import make_server


def tiny_engine():
    cfg = Config.make("tiny").override(**{
        "model.text_vocab_size": 261,  # byte tokenizer 260 + mask
        "model.image_vocab_size": 64,
        "model.length": 48,
        "model.txt_length": 16,
        "model.img_length": 32,
        "model.force_argmax_valid_indices": True,
        "model.dropout": 0.0,
        "sampling.steps": 4,
        "sampling.predictor": "maskgit",
    })
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    return InferenceEngine(cfg, model, params)


def test_expand_mask_tokens():
    assert expand_mask_tokens("a <mask:3> b") == "a <mask><mask><mask> b"
    assert expand_mask_tokens("x <mask> y") == "x <mask> y"


def test_gen_image_task():
    eng = tiny_engine()
    out = eng.run(text="hi", seed=1)
    assert out["task"] == "gen_image"
    # all image ids in image vocab range (after offset removal)
    assert (out["image_ids"] >= 0).all()
    assert (out["image_ids"] < 64).all()
    assert out["nfe"] >= 1


def test_gen_text_task():
    eng = tiny_engine()
    img = np.arange(32) % 64
    out = eng.run(image_ids=img, seed=1)
    assert out["task"] == "gen_text"
    assert isinstance(out["text"], str)
    # conditioning preserved
    np.testing.assert_array_equal(out["image_ids"][0], img)


def test_infill_mask_span():
    eng = tiny_engine()
    out = eng.run(text="ab<mask:2>cd", image_ids=np.arange(32) % 64,
                  task="infill", seed=2)
    assert out["task"] == "infill"


def test_http_server_roundtrip():
    eng = tiny_engine()
    server = make_server(eng, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health") as r:
            assert json.load(r)["status"] == "ok"

        req = {"messages": [{"role": "user", "content": "hello"}],
               "seed": 7, "steps": 4}
        data = json.dumps(req).encode()
        r = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=data,
            headers={"Content-Type": "application/json"}))
        body = json.load(r)
        assert body["object"] == "chat.completion"
        content = body["choices"][0]["message"]["content"]
        assert content[0]["type"] == "text"
        assert body["usage"]["nfe"] >= 1

        # cache: identical request returns identical id
        r2 = urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=data,
            headers={"Content-Type": "application/json"}))
        assert json.load(r2)["id"] == body["id"]

        # bad path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/nope", data=b"{}"))
        assert ei.value.code == 404
    finally:
        server.shutdown()


def test_t2i_fast_path_dispatch():
    """gen_image with full-text conditioning + maskgit uses the
    span-factored sampler (nfe = steps+1); masked prompts fall back."""
    eng = tiny_engine()  # maskgit, steps=4
    out = eng.run(text="a cat", task="gen_image", seed=1)
    assert ("t2i", 4) in eng._samplers  # fast path sampler was built/used
    out2 = eng.run(text="a <mask:2> cat", task="gen_image", seed=1)
    assert 4 in eng._samplers  # generic sampler used for the masked prompt
