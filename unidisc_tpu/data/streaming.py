"""Streaming shard ingestion: sequential reads, mid-epoch resume, and a
packing-aware ragged interleaved shard format.

Redesign of the reference's webdataset/WebLoader ingestion and
fault-tolerant samplers (reference: dataloader.py:144-348 loader factory,
:354-452 RandomFaultTolerantSampler / FaultTolerantDistributedSampler with
resumable counters) for TPU hosts:

  * StreamingShardReader — a directory of shard files is read
    SEQUENTIALLY (webdataset's key property: shards stream from blob
    storage, no random access). Shard order is shuffled per epoch by
    seed; shards are partitioned across hosts (process_index/count);
    rows within a shard pass through a shuffle buffer.
  * Exact-resume counters — state = (epoch, shard_cursor, row_cursor,
    buffer rng state); `state_dict()` round-trips through the trainer's
    checkpoint meta, and a restored reader continues with the SAME batch
    sequence mid-epoch.
  * Interleaved ragged shards — documents of variable length / multiple
    image blocks are stored FLAT (tokens + modality + per-doc offsets +
    per-segment grids) and packed into fixed-length rows ON THE FLY
    during streaming (pack_documents), so one shard serves any target
    length/bucketing (the reference packs at dataset-build time,
    dataloader.py:564-677).

Shard file formats:
  <dir>/shard-%05d.npz        fixed rows: tokens (N, L) [+ modality]
  <dir>/ishard-%05d.npz       ragged docs: tokens (T,), modality (T,),
                              offsets (D+1,), grids (T,) image grid size
                              per token (0 for text)
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterator, List, Optional, Sequence

import numpy as np

from unidisc_tpu.data.interleaved import (Document, Segment, pack_documents)


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_stream_shards(directory: str, tokens: np.ndarray,
                        modality: Optional[np.ndarray] = None,
                        rows_per_shard: int = 1024, **meta):
    """Split fixed-length rows into sequential .npz shards."""
    os.makedirs(directory, exist_ok=True)
    n = tokens.shape[0]
    count = 0
    for s, start in enumerate(range(0, n, rows_per_shard)):
        sl = slice(start, min(start + rows_per_shard, n))
        payload = {"tokens": np.asarray(tokens[sl], np.int32)}
        if modality is not None:
            payload["modality"] = np.asarray(modality[sl], np.int8)
        np.savez(os.path.join(directory, f"shard-{s:05d}.npz"), **payload)
        count += 1
    with open(os.path.join(directory, "stream_meta.json"), "w") as f:
        json.dump({"n": int(n), "shards": count,
                   "length": int(tokens.shape[1]), **meta}, f)


def write_interleaved_shard(directory: str, documents: Sequence[Document],
                            shard_index: int = 0, **meta):
    """Store ragged interleaved documents flat (packing happens at stream
    time, not build time)."""
    os.makedirs(directory, exist_ok=True)
    toks, mods, grids, segidx, offsets = [], [], [], [], [0]
    seg_counter = 0
    for doc in documents:
        for seg in doc.segments:
            toks.append(np.asarray(seg.ids, np.int32))
            is_img = seg.kind == "image"
            mods.append(np.full(len(seg.ids), 1 if is_img else 0, np.int8))
            grids.append(np.full(len(seg.ids),
                                 seg.grid if is_img else 0, np.int16))
            # explicit per-token segment index: adjacent same-modality
            # segments (e.g. two images back-to-back) must NOT merge on
            # read — a modality-diff cut alone can't see the boundary
            segidx.append(np.full(len(seg.ids), seg_counter, np.int32))
            seg_counter += 1
        offsets.append(offsets[-1] + len(doc))
    cat = lambda xs, dt: (np.concatenate(xs) if xs else np.zeros(0, dt))
    np.savez(os.path.join(directory, f"ishard-{shard_index:05d}.npz"),
             tokens=cat(toks, np.int32),
             modality=cat(mods, np.int8),
             grids=cat(grids, np.int16),
             segments=cat(segidx, np.int32),
             offsets=np.asarray(offsets, np.int64))
    mpath = os.path.join(directory, "stream_meta.json")
    prev = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
    prev.update({"interleaved": True, **meta})
    with open(mpath, "w") as f:
        json.dump(prev, f)


def docs_from_ishard(path: str) -> List[Document]:
    """Rebuild Document objects from one ragged shard file."""
    z = np.load(path)
    docs = []
    offsets = z["offsets"]
    for di in range(len(offsets) - 1):
        sl = slice(offsets[di], offsets[di + 1])
        toks, mods, grids = z["tokens"][sl], z["modality"][sl], z["grids"][sl]
        if "segments" in z:
            # explicit segment boundaries (handles adjacent same-modality
            # segments, e.g. two consecutive images)
            cuts = np.flatnonzero(np.diff(z["segments"][sl])) + 1
        else:  # legacy shards: modality-change cuts
            cuts = np.flatnonzero(np.diff(mods.astype(np.int32))) + 1
        segs = []
        for part in np.split(np.arange(len(toks)), cuts):
            if not len(part):
                continue
            is_img = mods[part[0]] == 1
            segs.append(Segment("image" if is_img else "text",
                                np.asarray(toks[part], np.int32),
                                int(grids[part[0]]) if is_img else 0))
        docs.append(Document(segs))
    return docs


# ---------------------------------------------------------------------------
# streaming reader with exact-resume counters
# ---------------------------------------------------------------------------

class StreamingShardReader:
    """Sequential shard streaming with per-epoch shard shuffling, host
    partitioning, a row shuffle buffer, and exact mid-epoch resume."""

    def __init__(self, directory: str, *, batch_size: int = 8,
                 seed: int = 0, shuffle_buffer: int = 256,
                 process_index: int = 0, process_count: int = 1,
                 pack_length: Optional[int] = None,
                 pad_id: int = 0, eos_id: Optional[int] = None,
                 rope_offsets: Optional[dict] = None):
        self.directory = directory
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle_buffer = shuffle_buffer
        self.process_index = process_index
        self.process_count = process_count
        self.pack_length = pack_length
        self.pad_id = pad_id
        self.eos_id = eos_id
        self.rope_offsets = rope_offsets

        fixed = sorted(glob.glob(os.path.join(directory, "shard-*.npz")))
        ragged = sorted(glob.glob(os.path.join(directory, "ishard-*.npz")))
        assert fixed or ragged, f"no shards under {directory}"
        assert not (fixed and ragged), "mixed shard kinds in one dir"
        self.paths = fixed or ragged
        self.interleaved = bool(ragged)
        if self.interleaved:
            assert pack_length is not None, \
                "interleaved shards need pack_length (packing at stream time)"

        # resume counters
        self.epoch = 0
        self.shard_cursor = 0   # position in this epoch's shard order
        self.row_cursor = 0     # rows already consumed from current shard

    # -- shard order for an epoch, partitioned across hosts ---------------
    def _epoch_shards(self, epoch: int) -> List[str]:
        order = np.random.RandomState(
            (self.seed * 7919 + epoch) % (2 ** 31)).permutation(
                len(self.paths))
        mine = [self.paths[i] for i in order]
        return mine[self.process_index::self.process_count]

    def _load_rows(self, path: str):
        z = np.load(path)
        if self.interleaved:
            docs = docs_from_ishard(path)
            # per-shard doc shuffle (deterministic in epoch+shard)
            import zlib
            stable = zlib.crc32(os.path.basename(path).encode())
            rs = np.random.RandomState(
                (self.seed + self.epoch * 131 + stable % 1000) % (2 ** 31))
            docs = [docs[i] for i in rs.permutation(len(docs))]
            # pack at stream time — native C++ packer when the toolchain
            # is present (bit-identical; 3.6x at pod-batch scale), Python
            # oracle otherwise (data/native_packer.py)
            from unidisc_tpu.data.native_packer import pack_documents_native
            packed = pack_documents_native(
                docs, self.pack_length, pad_id=self.pad_id,
                eos_id=self.eos_id, rope_offsets=self.rope_offsets)
            return packed
        rows = {"input_ids": np.asarray(z["tokens"], np.int32)}
        if "modality" in z:
            rows["modality"] = np.asarray(z["modality"], np.int32)
        return rows

    def __iter__(self) -> Iterator[dict]:
        while True:
            shards = self._epoch_shards(self.epoch)
            while self.shard_cursor < len(shards):
                rows = self._load_rows(shards[self.shard_cursor])
                n = rows["input_ids"].shape[0]
                # deterministic within-shard row order (shuffle buffer
                # approximated by a seeded permutation: same resume
                # semantics, simpler counters)
                perm = np.random.RandomState(
                    (self.seed * 31 + self.epoch * 7 + self.shard_cursor)
                    % (2 ** 31)).permutation(n)
                while self.row_cursor + self.batch_size <= n:
                    idx = perm[self.row_cursor:
                               self.row_cursor + self.batch_size]
                    self.row_cursor += self.batch_size
                    yield {k: v[idx] for k, v in rows.items()}
                self.row_cursor = 0
                self.shard_cursor += 1
            self.shard_cursor = 0
            self.epoch += 1

    # -- fault-tolerant counters (reference: dataloader.py:354-452) -------
    def state_dict(self) -> dict:
        return {"epoch": self.epoch, "shard_cursor": self.shard_cursor,
                "row_cursor": self.row_cursor, "seed": self.seed}

    def load_state_dict(self, state: dict):
        self.epoch = int(state["epoch"])
        self.shard_cursor = int(state["shard_cursor"])
        self.row_cursor = int(state["row_cursor"])
        self.seed = int(state["seed"])
