"""Offline token precompute: images + captions -> memory-mapped token shards.

Redesign of the reference's precompute pipeline
(reference: models/datasets/precompute_tokens.py:333+ main / enc:71 —
VQ-encode + text-tokenize whole datasets into TensorDict shards on N GPUs;
combine_token_dicts.py merges shards). Here the VQ encoder is our Flax
codec jitted on TPU, text uses the tokenizer factory, and shards are the
np.memmap format of data/token_shards.py.

CLI: python -m unidisc_tpu.data.precompute --out DIR --n 1000 [--codec dummy]
(with no --images, generates procedural data — the air-gapped smoke path).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Iterable, Iterator, Optional, Tuple

import numpy as np

from unidisc_tpu.data.token_shards import write_shard


def precompute_tokens(samples: Iterator[Tuple[str, np.ndarray]], out_dir: str,
                      *, tokenizer, codec, txt_length: int,
                      text_vocab_size: int, batch_size: int = 32,
                      shard_size: int = 4096) -> list:
    """samples yields (caption, image (H,W,3) in [-1,1]). Writes shards of
    packed [txt | img] rows; image ids offset by text_vocab_size
    (reference vocab layout: model_setup.py:90-115). Returns shard dirs."""
    import jax
    import jax.numpy as jnp

    encode = jax.jit(codec.encode)
    shard_rows = []
    shard_dirs = []
    buf_caps, buf_imgs = [], []

    def flush_batch():
        nonlocal buf_caps, buf_imgs
        if not buf_caps:
            return
        tok = tokenizer(buf_caps, max_length=txt_length)
        img_ids = np.asarray(encode(codec.params,
                                    jnp.asarray(np.stack(buf_imgs))))
        rows = np.concatenate(
            [tok["input_ids"], img_ids + text_vocab_size], axis=1)
        shard_rows.extend(rows.astype(np.int32))
        buf_caps, buf_imgs = [], []

    def flush_shard():
        nonlocal shard_rows
        if not shard_rows:
            return
        idx = len(shard_dirs)
        d = os.path.join(out_dir, f"shard_{idx:05d}")
        rows = np.stack(shard_rows)
        img_len = rows.shape[1] - txt_length
        modality = np.concatenate([
            np.zeros((rows.shape[0], txt_length), np.int8),
            np.ones((rows.shape[0], img_len), np.int8)], axis=1)
        write_shard(d, rows, modality, codec=codec.name,
                    txt_length=txt_length,
                    text_vocab_size=text_vocab_size)
        shard_dirs.append(d)
        shard_rows = []

    for caption, image in samples:
        buf_caps.append(caption)
        buf_imgs.append(image)
        if len(buf_caps) >= batch_size:
            flush_batch()
            if len(shard_rows) >= shard_size:
                flush_shard()
    flush_batch()
    flush_shard()
    return shard_dirs


def procedural_samples(n: int, image_size: int = 64,
                       seed: int = 0) -> Iterator[Tuple[str, np.ndarray]]:
    """Deterministic caption+image pairs for air-gapped smoke runs
    (reference dummy-data analogue)."""
    rng = np.random.RandomState(seed)
    shapes = ["circle", "square", "stripe"]
    for i in range(n):
        kind = shapes[i % 3]
        color = rng.rand(3) * 2 - 1
        img = np.full((image_size, image_size, 3), -1.0, np.float32)
        c = image_size // 2
        yy, xx = np.mgrid[:image_size, :image_size]
        if kind == "circle":
            mask = (yy - c) ** 2 + (xx - c) ** 2 < (c // 2) ** 2
        elif kind == "square":
            mask = (abs(yy - c) < c // 2) & (abs(xx - c) < c // 2)
        else:
            mask = (yy // 8) % 2 == 0
        img[mask] = color
        yield f"a {kind} image number {i}", img


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n", type=int, default=256)
    parser.add_argument("--codec", default="dummy")
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--txt-length", type=int, default=32)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--shard-size", type=int, default=1024)
    args = parser.parse_args(argv)

    from unidisc_tpu.tokenizers.image_codecs import get_codec
    from unidisc_tpu.tokenizers.text import get_tokenizer

    tokenizer = get_tokenizer("byte")
    codec = get_codec(args.codec, image_size=args.image_size)
    dirs = precompute_tokens(
        procedural_samples(args.n, args.image_size), args.out,
        tokenizer=tokenizer, codec=codec, txt_length=args.txt_length,
        text_vocab_size=tokenizer.vocab_size + 1,
        batch_size=args.batch_size, shard_size=args.shard_size)
    print(f"[precompute] wrote {len(dirs)} shard(s) to {args.out}")
    return dirs


if __name__ == "__main__":
    main()
