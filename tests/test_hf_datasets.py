"""Dataset adapter tests for the local (no-network) sources
(reference: models/datasets/image_datasets.py — imagefolder :611,
generated_images :719, UnpairedDatasetWrapper :393)."""

import json

import numpy as np
import pytest

from unidisc_tpu.data.hf_datasets import (DATASETS, TEXT_DATASETS,
                                          generated_images_stream,
                                          imagefolder_stream,
                                          unpaired_stream)


def _write_png(path, size=32, value=128):
    from PIL import Image
    arr = np.full((size, size, 3), value, np.uint8)
    Image.fromarray(arr).save(path)


def test_registry_covers_reference_battery():
    for name in ("imagenet", "cc12m", "mjhq", "laion400m", "facecaption",
                 "vggface2", "flickr30k", "winoground", "geneval", "mmc4",
                 "cambrian"):
        assert name in DATASETS
    for name in ("text8", "lm1b", "openwebtext"):
        assert name in TEXT_DATASETS


def test_imagefolder_sidecar_and_dirname_captions(tmp_path):
    d = tmp_path / "red_car"
    d.mkdir()
    _write_png(d / "a.png")
    _write_png(d / "b.png")
    (d / "b.txt").write_text("a custom caption")
    out = list(imagefolder_stream(str(tmp_path), image_size=16))
    assert len(out) == 2
    caps = {c for c, _ in out}
    assert caps == {"red car", "a custom caption"}
    for _, img in out:
        assert img.shape == (16, 16, 3)
        assert -1.01 <= img.min() and img.max() <= 1.01


def test_imagefolder_limit(tmp_path):
    for i in range(4):
        _write_png(tmp_path / f"{i}.png")
    assert len(list(imagefolder_stream(str(tmp_path), limit=2))) == 2


def test_generated_images_stream(tmp_path):
    _write_png(tmp_path / "s0.png")
    _write_png(tmp_path / "s1.png")
    (tmp_path / "samples.jsonl").write_text(
        json.dumps({"image": "s0.png", "text": "a cat"}) + "\n" +
        json.dumps({"image": "s1.png", "text": "a dog"}) + "\n")
    out = list(generated_images_stream(str(tmp_path), image_size=16))
    assert [c for c, _ in out] == ["a cat", "a dog"]


def test_unpaired_stream_pairs_every_image(tmp_path):
    imgs = [(f"orig{i}", np.zeros((4, 4, 3), np.float32)) for i in range(5)]
    texts = iter([f"t{i}" for i in range(3)])
    out = list(unpaired_stream(iter(imgs), texts, seed=0, buffer=2))
    assert len(out) == 5
    assert all(c.startswith("t") for c, _ in out)
    # text pool exhaustion falls back to reuse, never raises
    assert {c for c, _ in out} <= {"t0", "t1", "t2"}
