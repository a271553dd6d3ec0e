"""Chameleon/Lumina-style interleaved stream tokenizer.

TPU-native redesign of the reference's chameleon tokenizer family
(reference: unidisc/tokenizers/chameleon_tokenizers.py — which wraps
Lumina-mGPT's FlexARItemProcessor and the Chameleon VQ). That path needs a
vendored Lumina tree + torch; here the same surface is a self-contained
stream codec over our unified vocab, with any registered image codec
(tokenizers/image_codecs.py) supplying the VQ tokens:

  - variable-aspect crop machinery: ``build_crop_size_list`` /
    ``var_center_crop`` (reference :87-113, tensor_center_crop +
    var_center_crop) in numpy + jax.image.resize — host-side data prep.
  - stream layout (reference tokenize_chameleon_fast :115-180):
    ``<image_start> <grids:h> <grids:w>`` then row-major VQ tokens with a
    ``<new_line>`` token closing each row, then ``<image_end>``.  Image ids
    are offset into the unified vocab (the reference's img2bpe mapping
    becomes a flat ``+ text_vocab`` offset — same bijection, no table).
  - decode: scan the stream for image spans, return text ids + per-image
    token grids (reference decode_ids / decode_ids_batched :643-706);
    images are replaced by an ``<|image|>`` placeholder id in the text.
  - batch packing to a fixed model length with attention masks
    (reference :153-177).

Everything here is host-side numpy (it feeds the device pipeline); the only
device work — VQ encode/decode — goes through the jitted codec fns.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np


def build_crop_size_list(patch_size: int = 16, max_grids: int = 576,
                         max_aspect: float = 4.0) -> List[Tuple[int, int]]:
    """All (h, w) pixel crop sizes whose grid fits the token budget.

    Mirrors Lumina's generate_crop_size_list semantics (the reference prints
    ``self.crop_size_list`` from the vendored processor,
    chameleon_tokenizers.py:37): every (h_grids, w_grids) with
    h_grids * w_grids <= max_grids, aspect ratio within ``max_aspect``, and
    maximal area for its width — i.e. h_grids = max_grids // w_grids.
    """
    sizes = []
    w = 1
    while w * 1 <= max_grids:
        h = max_grids // w
        if max(h / w, w / h) <= max_aspect:
            sizes.append((h * patch_size, w * patch_size))
        w += 1
    # Deduplicate (small max_grids can repeat) and sort tall->wide.
    return sorted(set(sizes), key=lambda s: (-s[0], s[1]))


def _resize_bilinear(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize of an HWC float image (host-side, jax on CPU)."""
    import jax

    return np.asarray(jax.image.resize(img, (h, w, img.shape[2]),
                                       method="bilinear"))


def center_crop_to(img: np.ndarray, crop_hw: Tuple[int, int],
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Area-downscale by halving while >=2x target, then resize + crop.

    Reference tensor_center_crop (chameleon_tokenizers.py:87-102): repeated
    area 2x downsampling avoids aliasing, then a bilinear scale to cover the
    crop and a (random during training, center otherwise) crop.
    """
    ch, cw = crop_hw
    h, w = img.shape[:2]
    while h >= 2 * ch and w >= 2 * cw:
        img = img.reshape(h // 2, 2, w // 2, 2, -1).mean(axis=(1, 3))
        h, w = img.shape[:2]
    scale = max(ch / h, cw / w)
    nh, nw = round(h * scale), round(w * scale)
    img = _resize_bilinear(img, nh, nw)
    if rng is None:
        top, left = (nh - ch) // 2, (nw - cw) // 2
    else:
        top = int(rng.integers(0, nh - ch + 1))
        left = int(rng.integers(0, nw - cw + 1))
    return img[top:top + ch, left:left + cw]


def var_center_crop(img: np.ndarray, crop_size_list: Sequence[Tuple[int, int]],
                    rng: Optional[np.random.Generator] = None,
                    top_k: int = 1) -> np.ndarray:
    """Pick the aspect-best crop size (among top_k) and crop to it.

    Reference var_center_crop (chameleon_tokenizers.py:104-113): rank crop
    sizes by retained-percentage min(cw/w, ch/h)/max(cw/w, ch/h), choose
    randomly among the best top_k.
    """
    h, w = img.shape[:2]
    rem = [min(cw / w, ch / h) / max(cw / w, ch / h)
           for ch, cw in crop_size_list]
    ranked = sorted(zip(rem, crop_size_list), reverse=True)[:top_k]
    if rng is None or top_k == 1:
        crop = ranked[0][1]
    else:
        crop = ranked[int(rng.integers(0, len(ranked)))][1]
    return center_crop_to(img, crop, rng)


@dataclasses.dataclass(frozen=True)
class ChameleonSpec:
    """Unified-vocab layout for chameleon-style interleaved streams.

    [0, text_vocab)                         text ids
    [text_vocab, text_vocab + img_vocab)    image VQ ids (+offset bijection,
                                            the reference's img2bpe table)
    then special stream tokens:             image_start, image_end, new_line,
                                            image_placeholder, grid tokens
                                            (one per grid count 1..max_grids).
    """

    text_vocab: int
    img_vocab: int
    patch_size: int = 16
    max_grids: int = 64

    @property
    def image_start(self) -> int:
        return self.text_vocab + self.img_vocab

    @property
    def image_end(self) -> int:
        return self.image_start + 1

    @property
    def new_line(self) -> int:
        return self.image_start + 2

    @property
    def image_placeholder(self) -> int:
        """Stands in for a decoded image span in text output
        (reference's ``<|image|>``, decode_ids :688)."""
        return self.image_start + 3

    def grid_token(self, n: int) -> int:
        """Token encoding a grid dimension of n patches
        (reference get_n_grids_token, tokenize_chameleon_fast :144-146)."""
        if not 1 <= n <= self.max_grids:
            raise ValueError(f"grid count {n} outside [1, {self.max_grids}]")
        return self.image_start + 4 + (n - 1)

    def grid_from_token(self, tok: int) -> int:
        return tok - (self.image_start + 4) + 1

    @property
    def vocab_size(self) -> int:
        return self.image_start + 4 + self.max_grids

    def offset_image_ids(self, vq_ids: np.ndarray) -> np.ndarray:
        return np.asarray(vq_ids, np.int64) + self.text_vocab

    def encode_image_grid(self, vq_grid: np.ndarray) -> np.ndarray:
        """(h_grids, w_grids) raw VQ ids -> 1D stream with header/newlines.

        Layout per reference tokenize_chameleon_fast :131-152:
        ``start, grid(h), grid(w), row0..., nl, row1..., nl, ..., end``.
        """
        hg, wg = vq_grid.shape
        body = np.concatenate(
            [self.offset_image_ids(vq_grid),
             np.full((hg, 1), self.new_line, np.int64)], axis=1).reshape(-1)
        return np.concatenate([
            np.asarray([self.image_start, self.grid_token(hg),
                        self.grid_token(wg)], np.int64),
            body,
            np.asarray([self.image_end], np.int64)])

    def decode_image_span(self, span: np.ndarray) -> np.ndarray:
        """Inverse of encode_image_grid's body (span excludes start/end)."""
        hg = self.grid_from_token(int(span[0]))
        wg = self.grid_from_token(int(span[1]))
        body = np.asarray(span[2:], np.int64).reshape(hg, wg + 1)
        if not (body[:, -1] == self.new_line).all():
            raise ValueError("malformed image span: missing new_line column")
        return body[:, :-1] - self.text_vocab

    def image_span_length(self, hg: int, wg: int) -> int:
        return 3 + hg * (wg + 1) + 1


def encode_document(spec: ChameleonSpec, parts: Sequence) -> np.ndarray:
    """Interleave text-id arrays and (h,w) VQ grids into one stream.

    ``parts`` is an ordered list of either 1D int arrays (text ids) or 2D
    int arrays (raw VQ grids). The reference builds this inside the vendored
    item processor (tokenize_chameleon_fast :158-172); here it is explicit.
    """
    chunks = []
    for p in parts:
        p = np.asarray(p)
        if p.ndim == 1:
            chunks.append(p.astype(np.int64))
        elif p.ndim == 2:
            chunks.append(spec.encode_image_grid(p))
        else:
            raise ValueError(f"part with ndim {p.ndim}")
    return (np.concatenate(chunks) if chunks
            else np.zeros((0,), np.int64))


def decode_stream(spec: ChameleonSpec, ids: Sequence[int]
                  ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Stream -> (text ids with placeholders, list of raw VQ grids).

    Reference decode_ids (chameleon_tokenizers.py:661-704): walk the stream,
    cut out image_start..image_end spans, decode each to a grid, and leave a
    placeholder id in the text.  Unterminated spans are dropped (the
    reference silently stops at the end of the stream).
    """
    ids = np.asarray(ids, np.int64).reshape(-1)
    text: List[int] = []
    grids: List[np.ndarray] = []
    i = 0
    starts = (ids == spec.image_start)
    ends = (ids == spec.image_end)
    while i < len(ids):
        if starts[i]:
            close = np.nonzero(ends[i + 1:])[0]
            if close.size == 0:
                break
            j = i + 1 + int(close[0])
            grids.append(spec.decode_image_span(ids[i + 1:j]))
            text.append(spec.image_placeholder)
            i = j + 1
        else:
            text.append(int(ids[i]))
            i += 1
    return np.asarray(text, np.int64), grids


def batch_encode(spec: ChameleonSpec, docs: Sequence[Sequence],
                 length: int, pad_id: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed-length (ids, attention_mask) batch from variable docs.

    Reference tokenize_chameleon_fast :153-177 (fill, truncate-with-warning,
    boolean mask). Truncation clips at ``length``.
    """
    bs = len(docs)
    out = np.full((bs, length), pad_id, np.int64)
    mask = np.zeros((bs, length), bool)
    for i, parts in enumerate(docs):
        stream = encode_document(spec, parts)
        n = min(len(stream), length)
        out[i, :n] = stream[:n]
        mask[i, :n] = True
    return out, mask


def tokenize_t2i_batch(spec: ChameleonSpec, text_tokenizer, codec,
                       images: np.ndarray, captions: Sequence[str],
                       length: int,
                       crop_size_list: Optional[Sequence] = None,
                       rng: Optional[np.random.Generator] = None,
                       max_caption_chars: int = 200
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """End-to-end: images+captions -> chameleon streams, via a jitted codec.

    The t2i conversation framing mirrors the reference's prompt template
    (chameleon_tokenizers.py:44, "Generate an image of WxH according to the
    following prompt:"). All images share one var-crop size per batch (the
    reference crops the whole batch together, :125) so the codec encode is
    a single jitted call.
    """
    import jax.numpy as jnp

    if crop_size_list is not None:
        images = np.stack([
            var_center_crop(im, crop_size_list, rng) for im in images])
    h, w = images.shape[1:3]
    hg, wg = h // spec.patch_size, w // spec.patch_size
    vq = np.asarray(codec.encode(codec.params, jnp.asarray(images)))
    vq = vq.reshape(len(images), hg, wg)
    docs = []
    for i, cap in enumerate(captions):
        prompt = (f"Generate an image of {w}x{h} according to the "
                  f"following prompt:\n{cap[:max_caption_chars]}")
        txt = np.asarray(
            text_tokenizer.encode(prompt, add_bos=True, add_eos=False),
            np.int64)
        docs.append([txt, vq[i]])
    return batch_encode(spec, docs, length)
