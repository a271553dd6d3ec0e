"""Streaming shard ingestion tests: sequential reads, host partitioning,
exact mid-epoch resume, ragged interleaved shards packed at stream time,
and the train CLI running from a streamed dir with resume."""

import itertools
import os

import numpy as np
import pytest

from unidisc_tpu.data.interleaved import make_document
from unidisc_tpu.data.streaming import (StreamingShardReader,
                                        docs_from_ishard,
                                        write_interleaved_shard,
                                        write_stream_shards)


def _write_fixed(tmp_path, n=64, l=16, rows_per_shard=16):
    toks = np.arange(n * l, dtype=np.int32).reshape(n, l) % 100_000
    mod = np.zeros((n, l), np.int8)
    mod[:, l // 2:] = 1
    write_stream_shards(str(tmp_path), toks, mod,
                        rows_per_shard=rows_per_shard)
    return toks


def test_stream_covers_all_rows_per_epoch(tmp_path):
    toks = _write_fixed(tmp_path)
    reader = StreamingShardReader(str(tmp_path), batch_size=4, seed=0)
    seen = []
    for batch in itertools.islice(iter(reader), 16):  # 64 rows / 4
        assert batch["input_ids"].shape == (4, 16)
        assert batch["modality"].shape == (4, 16)
        seen.append(batch["input_ids"][:, 0])
    # one epoch covers every row exactly once (row ids via first column)
    seen = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(seen, np.sort(toks[:, 0]))


def test_mid_epoch_exact_resume(tmp_path):
    _write_fixed(tmp_path)
    a = StreamingShardReader(str(tmp_path), batch_size=4, seed=3)
    it = iter(a)
    for _ in range(5):  # consume 5 batches (mid-shard, mid-epoch)
        next(it)
    state = a.state_dict()
    expect = [next(it)["input_ids"] for _ in range(6)]

    b = StreamingShardReader(str(tmp_path), batch_size=4, seed=0)
    b.load_state_dict(state)
    got = [nb["input_ids"] for nb in itertools.islice(iter(b), 6)]
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(e, g)


def test_host_partitioning_disjoint(tmp_path):
    _write_fixed(tmp_path, n=64, rows_per_shard=16)  # 4 shards
    rows = []
    for pi in range(2):
        r = StreamingShardReader(str(tmp_path), batch_size=4, seed=1,
                                 process_index=pi, process_count=2)
        rows.append(np.concatenate(
            [b["input_ids"][:, 0] for b in itertools.islice(iter(r), 8)]))
    # the two hosts see disjoint shard sets covering everything
    assert not set(rows[0]) & set(rows[1])
    assert len(set(rows[0]) | set(rows[1])) == 64


def test_interleaved_ragged_shard_roundtrip(tmp_path):
    docs = [
        make_document(text_ids=[5, 6, 7], image_ids=np.arange(16) + 300,
                      grid=4),
        make_document(interleave=[("text", [9, 10]),
                                  ("image", np.arange(16) + 400, 4),
                                  ("text", [11])]),
        make_document(text_ids=[1, 2, 3, 4]),
    ]
    write_interleaved_shard(str(tmp_path), docs, shard_index=0)
    back = docs_from_ishard(
        os.path.join(str(tmp_path), "ishard-00000.npz"))
    assert len(back) == 3
    assert [s.kind for s in back[1].segments] == ["text", "image", "text"]
    np.testing.assert_array_equal(back[1].segments[1].ids,
                                  np.arange(16) + 400)
    assert back[1].segments[1].grid == 4


def test_interleaved_stream_packs_on_the_fly(tmp_path):
    docs = [make_document(text_ids=np.arange(3) + 1,
                          image_ids=np.arange(16) + 300, grid=4)
            for _ in range(8)]
    write_interleaved_shard(str(tmp_path), docs, shard_index=0)
    reader = StreamingShardReader(str(tmp_path), batch_size=1, seed=0,
                                  pack_length=48, eos_id=2)
    batch = next(iter(reader))
    assert batch["input_ids"].shape == (1, 48)
    assert set(batch) >= {"input_ids", "modality", "sample_ids",
                          "rope_index"}
    # packing put at least two 20-token docs into the 48-token row
    sids = batch["sample_ids"][0]
    assert len(np.unique(sids[sids >= 0])) >= 2


def test_train_cli_streams_with_resume(tmp_path):
    """End-to-end: train CLI runs from a streamed shard dir, checkpoints,
    and a second run resumes from the loader counters (VERDICT #8 'done'
    criterion)."""
    from unidisc_tpu.train import main as train_main

    l, txt = 16, 8
    toks = np.random.RandomState(0).randint(0, 50, (48, l)).astype(np.int32)
    mod = np.zeros((48, l), np.int8)
    mod[:, txt:] = 1
    data_dir = tmp_path / "shards"
    # 24-row shards + batch 8: step 4 lands mid-shard (row_cursor=8)
    write_stream_shards(str(data_dir), toks, mod, rows_per_shard=24)

    run_dir = str(tmp_path / "run")
    common = ["--batch-size", "8", "--run-dir", run_dir,
              "--data", str(data_dir), "--stream", "--ckpt-every", "4",
              "model=tiny", "model.length=16", "model.txt_length=8",
              "model.img_length=8", "model.text_vocab_size=40",
              "model.image_vocab_size=20", "trainer.warmup_steps=2"]
    r1 = train_main(common + ["trainer.max_steps=4"])
    assert r1["step"] == 4
    r2 = train_main(common + ["trainer.max_steps=8"])  # resume mid-epoch
    assert r2["step"] == 8
    assert np.isfinite(r2["loss"])

def test_adjacent_image_segments_roundtrip(tmp_path):
    """Two back-to-back image segments must NOT merge on shard round-trip
    (review fix: modality-diff cuts can't see same-modality boundaries —
    the shard now stores explicit per-token segment indices)."""
    from unidisc_tpu.data.interleaved import make_document
    from unidisc_tpu.data.streaming import (docs_from_ishard,
                                            write_interleaved_shard)

    doc = make_document(interleave=[
        ("text", np.arange(5)),
        ("image", np.arange(256), 16),
        ("image", np.arange(64), 8)])
    write_interleaved_shard(str(tmp_path), [doc], shard_index=0)
    docs = docs_from_ishard(str(tmp_path / "ishard-00000.npz"))
    assert len(docs) == 1
    segs = docs[0].segments
    assert [s.kind for s in segs] == ["text", "image", "image"]
    assert [len(s.ids) for s in segs] == [5, 256, 64]
    assert segs[1].grid == 16 and segs[2].grid == 8
