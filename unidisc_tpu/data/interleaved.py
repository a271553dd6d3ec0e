"""Interleaved multimodal document packing.

Redesign of the reference's interleaved machinery for static TPU shapes:
  * PackingCollate (reference: dataloader.py:564-677) — packs variable-length
    image-text documents into fixed-length rows with `sample_ids`, never
    splitting an image block, inserting EOS between docs, padding with -1
    sample ids
  * per-sample attention isolation (reference FlexAttention block masks,
    model_utils.py:740-770) — consumed as segment ids by the Pallas kernel
    or as a dense mask by the XLA backend
  * RoPE stitching (reference: models/dit.py:122-191 add_img_data_to_blocks/
    add_txt_data_to_blocks) — instead of dynamically stitching per-block
    rope buffers at runtime, the collate emits a per-token `rope_index` into
    a static combined table: text tokens index a 1D table by their position
    within the document's text flow; image tokens index a 2D-RoPE table by
    their raster position within their image block (restarting per image).

Everything downstream stays shape-static and jittable; all raggedness is
resolved host-side here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class Segment:
    kind: str          # "text" | "image"
    ids: np.ndarray    # token ids (already offset into the unified vocab)
    grid: int = 0      # image: tokens per side (e.g. 16 for 256 tokens)


@dataclass
class Document:
    segments: List[Segment]

    def __len__(self):
        return sum(len(s.ids) for s in self.segments)


def make_document(text_ids: Sequence[int] = (), image_ids=None,
                  grid: int = 16, interleave=None) -> Document:
    """Convenience constructors: text-only, text+image, or explicit
    [(kind, ids), ...] interleave."""
    segs = []
    if interleave is not None:
        for kind, ids, *rest in interleave:
            g = rest[0] if rest else grid
            segs.append(Segment(kind, np.asarray(ids, np.int32), g))
    else:
        if len(text_ids):
            segs.append(Segment("text", np.asarray(text_ids, np.int32)))
        if image_ids is not None:
            segs.append(Segment("image", np.asarray(image_ids, np.int32),
                                grid))
    return Document(segs)


class PackedBatch(dict):
    """dict with input_ids, modality, sample_ids, rope_index,
    img_block_index, attention_mask — all (B, L) np.int32 except
    attention_mask (bool). img_block_index holds, for each image token,
    the 0-based count of image blocks preceding it in the same sample
    (feeds the DIT's img_count_embedding; reference
    models/dit.py:132-139 block_counts)."""


def pack_documents(docs: Sequence[Document], length: int, *,
                   pad_id: int, eos_id: Optional[int] = None,
                   batch_size: Optional[int] = None,
                   rope_offsets: Optional[dict] = None) -> PackedBatch:
    """Greedy first-fit packing of whole documents into fixed-length rows.

    A document never spans rows, and an image block is never split
    (reference repairs split trailing images, dataloader.py:628-650; we
    avoid the problem by construction). Documents longer than `length` are
    truncated at a segment boundary (whole trailing segments dropped).
    """
    rows: List[List[Tuple[int, Segment]]] = []  # [(sample_id, segment)]
    row_space: List[int] = []

    sample_counter = 0
    for doc in docs:
        segs = list(doc.segments)
        # truncate at segment boundaries to fit an empty row
        total = sum(len(s.ids) for s in segs) + (1 if eos_id is not None else 0)
        while segs and total > length:
            dropped = segs.pop()
            total -= len(dropped.ids)
        if not segs:
            continue
        size = sum(len(s.ids) for s in segs) + (1 if eos_id is not None else 0)
        # first-fit
        placed = False
        for ri in range(len(rows)):
            if row_space[ri] >= size:
                rows[ri].extend((sample_counter, s) for s in segs)
                if eos_id is not None:
                    rows[ri].append((sample_counter, Segment(
                        "text", np.asarray([eos_id], np.int32))))
                row_space[ri] -= size
                placed = True
                break
        if not placed:
            row = [(sample_counter, s) for s in segs]
            if eos_id is not None:
                row.append((sample_counter, Segment(
                    "text", np.asarray([eos_id], np.int32))))
            rows.append(row)
            row_space.append(length - size)
        sample_counter += 1

    if batch_size is not None:
        while len(rows) < batch_size:
            rows.append([])
            row_space.append(length)
        rows = rows[:batch_size]

    b = len(rows)
    input_ids = np.full((b, length), pad_id, np.int32)
    modality = np.zeros((b, length), np.int32)
    sample_ids = np.full((b, length), -1, np.int32)
    rope_index = np.zeros((b, length), np.int32)

    img_block_index = np.zeros((b, length), np.int32)
    for ri, row in enumerate(rows):
        pos = 0
        samp_off = {}  # sample_id -> offset within sample (ALL tokens)
        img_cnt = {}   # sample_id -> image blocks seen so far
        for sid, seg in row:
            n = len(seg.ids)
            input_ids[ri, pos:pos + n] = seg.ids
            sample_ids[ri, pos:pos + n] = sid
            off = samp_off.get(sid, 0)
            if seg.kind == "image":
                modality[ri, pos:pos + n] = 1
                # raster index within this image block (restarts per image);
                # with rope_offsets (multi-resolution tables) the index is
                # ABSOLUTE into the combined rope table
                base = rope_offsets[n] if rope_offsets is not None else 0
                rope_index[ri, pos:pos + n] = base + np.arange(n)
                cnt = img_cnt.get(sid, 0)
                img_block_index[ri, pos:pos + n] = cnt
                img_cnt[sid] = cnt + 1
            else:
                # text 1D rope index = offset within the sample counting
                # ALL tokens (incl. preceding image blocks) — the
                # reference's add_txt_data_to_blocks writes the 1D table
                # aligned to the contiguous sample block, not to a
                # text-only flow (models/dit.py:181-191)
                rope_index[ri, pos:pos + n] = np.arange(off, off + n)
            samp_off[sid] = off + n
            pos += n

    return PackedBatch(
        input_ids=input_ids, modality=modality, sample_ids=sample_ids,
        rope_index=rope_index, img_block_index=img_block_index,
        attention_mask=(sample_ids >= 0))


def unpack_rows(batch: PackedBatch) -> List[List[dict]]:
    """Split packed rows back into per-sample element lists
    (reference decode path: handle_interleaved_decode model_eval.py:2824,
    data_defs.py:10-93)."""
    out = []
    b, l = batch["input_ids"].shape
    for ri in range(b):
        sids = batch["sample_ids"][ri]
        elements = []
        for sid in np.unique(sids[sids >= 0]):
            sel = sids == sid
            mods = batch["modality"][ri][sel]
            ids = batch["input_ids"][ri][sel]
            # split into alternating modality runs
            cuts = np.flatnonzero(np.diff(mods)) + 1
            parts = np.split(np.arange(len(ids)), cuts)
            segs = [{"kind": "image" if mods[p[0]] else "text",
                     "ids": ids[p]} for p in parts if len(p)]
            elements.append({"sample_id": int(sid), "segments": segs})
        out.append(elements)
    return out
