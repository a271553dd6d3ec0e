"""Interleaved document tokenization: `<image>`-split prompts -> Documents.

Redesign of the reference's tokenizer_image_token
(reference: unidisc/tokenizers/tokenize_interleaved.py:18+ — split a prompt
on `<image>`, tokenize the text spans, splice image-token blocks in between,
emit ids/modality/sample_ids). Here the output is a `Document` for
data/interleaved.pack_documents, which resolves all raggedness host-side.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from unidisc_tpu.data.interleaved import Document, Segment
from unidisc_tpu.tokenizers.text import IMAGE_TOKEN


def tokenize_interleaved(prompt: str, image_token_blocks: Sequence,
                         tokenizer, *, text_vocab_size: int,
                         grid: int = 16) -> Document:
    """Build an interleaved Document from a prompt with `<image>` slots.

    Args:
      prompt: text with zero or more `<image>` markers.
      image_token_blocks: one VQ-token array per `<image>` marker (raw codec
        ids; offset by text_vocab_size here).
      tokenizer: text tokenizer (encode(str, add_bos, add_eos)).
      text_vocab_size: unified-vocab offset for image ids.
    """
    parts = prompt.split(IMAGE_TOKEN)
    n_slots = len(parts) - 1
    assert n_slots == len(image_token_blocks), \
        f"{n_slots} <image> slots but {len(image_token_blocks)} image blocks"
    segments: List[Segment] = []
    for i, part in enumerate(parts):
        ids = tokenizer.encode(part, add_bos=(i == 0),
                               add_eos=(i == len(parts) - 1))
        if ids:
            segments.append(Segment("text", np.asarray(ids, np.int32)))
        if i < n_slots:
            img = np.asarray(image_token_blocks[i], np.int32).reshape(-1)
            segments.append(Segment("image", img + text_vocab_size,
                                    grid=grid))
    return Document(segments)
