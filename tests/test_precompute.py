"""Precompute pipeline test: procedural samples -> shards -> trainable
(reference: models/datasets/precompute_tokens.py)."""

import numpy as np

from unidisc_tpu.data.precompute import main as precompute_main
from unidisc_tpu.data.token_shards import TokenShardDataset


def test_precompute_end_to_end(tmp_path):
    out = str(tmp_path / "shards")
    dirs = precompute_main(["--out", out, "--n", "64", "--codec", "dummy",
                            "--image-size", "64", "--txt-length", "16",
                            "--batch-size", "16", "--shard-size", "40"])
    # shard flush is a soft cap at batch granularity: 48 rows + 16 rows
    assert len(dirs) == 2

    ds = TokenShardDataset(dirs[0])
    assert ds.meta["codec"] == "dummy"
    assert ds.meta["txt_length"] == 16
    batch = ds.get(np.arange(4))
    ids, mods = batch["input_ids"], batch["modality"]
    txt_len = 16
    # text region below text vocab, image region offset above it
    tvs = ds.meta["text_vocab_size"]
    assert (ids[:, :txt_len] < tvs).all()
    assert (ids[:, txt_len:] >= tvs).all()
    assert (mods[:, :txt_len] == 0).all() and (mods[:, txt_len:] == 1).all()

    # deterministic: same args give identical tokens
    out2 = str(tmp_path / "shards2")
    dirs2 = precompute_main(["--out", out2, "--n", "64", "--codec", "dummy",
                             "--image-size", "64", "--txt-length", "16",
                             "--batch-size", "16", "--shard-size", "40"])
    ds2 = TokenShardDataset(dirs2[0])
    np.testing.assert_array_equal(np.asarray(ds.tokens),
                                  np.asarray(ds2.tokens))
