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
# (the reference's get_image_dataset switch, image_datasets.py:520-950)
DATASETS = {
    "imagenet": ("imagenet-1k", "image", "label"),
    "cc12m": ("pixparse/cc12m-wds", "jpg", "txt"),
    "cc12m_3m": ("pixparse/cc12m-wds", "jpg", "txt"),
    "cub200": ("Multimodal-Fatima/CUB_train", "image", "description"),
    "mjhq": ("playgroundai/MJHQ-30K", "image", "prompt"),
    "coco": ("HuggingFaceM4/COCO", "image", "sentences"),
    "laion-aesthetic": ("laion/laion2B-en-aesthetic", "URL", "TEXT"),
    "laion400m": ("laion/laion400m", "URL", "TEXT"),
    "facecaption": ("OpenFace-CQUPT/FaceCaption-15M", "image", "caption"),
    "vggface2": ("ProgramComputer/VGGFace2", "image", "label"),
    "flickr30k": ("nlphuji/flickr30k", "image", "caption"),
    "winoground": ("facebook/winoground", "image_0", "caption_0"),
    "geneval": ("djghosh/geneval", "image", "prompt"),
    "mmc4": ("HuggingFaceM4/mmc4", "image", "text"),
    "cambrian": ("nyu-visionx/Cambrian-10M", "image", "conversations"),
}

# text-only datasets for the unpaired path (reference:
# models/datasets/text_datasets.py — text8, lm1b, openwebtext)
TEXT_DATASETS = {
    "text8": ("afmck/text8", "text"),
    "lm1b": ("lm1b", "text"),
    "openwebtext": ("openwebtext", "text"),
    "fineweb": ("HuggingFaceFW/fineweb", "text"),
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


def text_stream(name: str, *, split: str = "train",
                limit: Optional[int] = None, streaming: bool = True
                ) -> Iterator[str]:
    """Text-only stream (reference: models/datasets/text_datasets.py
    get_text_dataset — text8/lm1b/openwebtext)."""
    path, col = TEXT_DATASETS.get(name, (name, "text"))
    try:
        import datasets
        ds = datasets.load_dataset(path, split=split, streaming=streaming)
    except Exception as e:  # noqa: BLE001
        raise RuntimeError(
            f"could not load HF text dataset {path!r} "
            f"({type(e).__name__}: {e}); pre-download on a networked host"
        ) from e
    n = 0
    for row in ds:
        if limit is not None and n >= limit:
            return
        t = row.get(col)
        if t:
            yield str(t)
            n += 1


def imagefolder_stream(root: str, *, image_size: int = 256,
                       limit: Optional[int] = None
                       ) -> Iterator[Tuple[str, np.ndarray]]:
    """Local directory of images with optional sidecar captions
    (reference 'imagefolder', image_datasets.py:611-615). Caption source
    per image x.png: x.txt next to it, else the parent directory name."""
    import pathlib

    root_p = pathlib.Path(root)
    n = 0
    for p in sorted(root_p.rglob("*")):
        if p.suffix.lower() not in (".png", ".jpg", ".jpeg", ".webp"):
            continue
        if limit is not None and n >= limit:
            return
        cap_file = p.with_suffix(".txt")
        cap = cap_file.read_text().strip() if cap_file.exists() \
            else p.parent.name.replace("_", " ")
        try:
            from PIL import Image
            img = Image.open(p)
        except Exception:  # noqa: BLE001
            continue
        yield cap, _prep_image(img, image_size)
        n += 1


def generated_images_stream(run_dir: str, *, image_size: int = 256,
                            limit: Optional[int] = None
                            ) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream a generate-CLI run dir: PNGs + samples.jsonl captions
    (reference 'generated_images', image_datasets.py:719-721)."""
    import json as _json
    import pathlib

    root = pathlib.Path(run_dir)
    caps = {}
    meta = root / "samples.jsonl"
    if meta.exists():
        for line in meta.read_text().splitlines():
            try:
                rec = _json.loads(line)
                caps[rec.get("image", "")] = rec.get("text", "")
            except Exception:  # noqa: BLE001
                continue
    n = 0
    for p in sorted(root.glob("*.png")):
        if limit is not None and n >= limit:
            return
        from PIL import Image
        yield caps.get(p.name, ""), _prep_image(Image.open(p), image_size)
        n += 1


def unpaired_stream(image_iter, text_iter, *, seed: int = 0,
                    buffer: int = 256) -> Iterator[Tuple[str, np.ndarray]]:
    """Pair independent image and text sources at random — the reference's
    UnpairedDatasetWrapper (image_datasets.py:393-421) for multimodal
    batches where txt and img halves come from different corpora.

    Both iterators are consumed lazily; texts are shuffled within a
    reservoir of `buffer` to decorrelate pairing order."""
    rng = np.random.default_rng(seed)
    pool = []
    for t in text_iter:
        pool.append(t)
        if len(pool) >= buffer:
            break
    if not pool:
        raise ValueError("empty text stream")
    for _, img in image_iter:
        # swap a random pool slot with the next text (stream shuffle)
        try:
            new_t = next(text_iter)
            j = int(rng.integers(0, len(pool)))
            t, pool[j] = pool[j], new_t
        except StopIteration:
            t = pool[int(rng.integers(0, len(pool)))]
        yield t, img
