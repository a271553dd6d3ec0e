"""HuggingFace dataset adapters for the precompute pipeline.

Counterpart of the reference's dataset zoo
(reference: models/datasets/image_datasets.py:520-950 — imagenet,
cc12m-wds, CUB, MJHQ, geneval, MMC4, cambrian, laion400m, facecaption...).
Each adapter yields (caption, image[-1,1] float (H,W,3)) pairs for
data/precompute.precompute_tokens; heavy lifting (decode, resize) happens
here, offline, so the TPU training path only ever sees token shards.

Requires downloaded/cached datasets (air-gapped TPU hosts use the
procedural generator in data/precompute.py instead).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

# dataset name -> (hf path, image column, caption column)
DATASETS = {
    "imagenet": ("imagenet-1k", "image", "label"),
    "cc12m": ("pixparse/cc12m-wds", "jpg", "txt"),
    "cub200": ("Multimodal-Fatima/CUB_train", "image", "description"),
    "mjhq": ("playgroundai/MJHQ-30K", "image", "prompt"),
    "coco": ("HuggingFaceM4/COCO", "image", "sentences"),
    "laion-aesthetic": ("laion/laion2B-en-aesthetic", "URL", "TEXT"),
}


def _prep_image(img, image_size: int) -> np.ndarray:
    from PIL import Image
    if not isinstance(img, Image.Image):
        img = Image.fromarray(np.asarray(img))
    img = img.convert("RGB").resize((image_size, image_size),
                                    Image.BICUBIC)
    return np.asarray(img, np.float32) / 127.5 - 1.0


def hf_image_caption_stream(name: str, *, split: str = "train",
                            image_size: int = 256,
                            limit: Optional[int] = None,
                            streaming: bool = True
                            ) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (caption, image) pairs from a cached/downloadable HF dataset
    (reference: get_image_dataset image_datasets.py:520)."""
    if name not in DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(DATASETS)} "
                       f"(or pass any HF path via hf_stream)")
    path, img_col, cap_col = DATASETS[name]
    yield from hf_stream(path, img_col, cap_col, split=split,
                         image_size=image_size, limit=limit,
                         streaming=streaming)


def hf_stream(path: str, img_col: str, cap_col: str, *, split="train",
              image_size=256, limit=None, streaming=True):
    try:
        import datasets
        ds = datasets.load_dataset(path, split=split, streaming=streaming)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"could not load HF dataset {path!r} ({type(e).__name__}: {e}); "
            f"on air-gapped hosts pre-download with `datasets.load_dataset` "
            f"on a networked machine, or use the procedural generator "
            f"(python -m unidisc_tpu.data.precompute without --images)"
        ) from e
    n = 0
    for row in ds:
        if limit is not None and n >= limit:
            return
        img = row.get(img_col)
        cap = row.get(cap_col)
        if img is None or cap is None:
            continue
        if isinstance(cap, (list, tuple)):
            cap = cap[0] if cap else ""
        if isinstance(cap, dict):
            cap = cap.get("raw", "")
        try:
            yield str(cap), _prep_image(img, image_size)
            n += 1
        except Exception:  # noqa: BLE001 — skip undecodable rows
            continue
