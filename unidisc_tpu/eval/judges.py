"""Quality judges: CIDEr-D, MAUVE, FID feature extractors, CLIP score,
generative-perplexity judge LMs.

Reference battery: model_eval.py:1275-1499 (inline/clean FID),
:1265 (CLIP score), :1590-1733 (MAUVE + entropy), model_utils.py:514-603
(gen-PPL vs GPT-2-large/Llama judges), CIDEr via pycocoevalcap
(model_setup.py:236-247). The reference leans on downloaded torch
checkpoints for all of these; this module splits each judge into

  * a NATIVE statistics/metric path that runs with zero external assets
    (CIDEr-D is pure n-gram math; MAUVE runs on any feature embedding —
    a deterministic bag-of-ngrams embedder ships here; Frechet distance
    runs on a fixed-seed random-conv feature net, giving a stable relative
    image-distribution metric with no weights), and
  * an ASSET-GATED driver that loads the reference's actual judge nets
    (InceptionV3 FID weights, CLIP, GPT-2-large) from a local directory —
    `UNIDISC_ASSETS` env var or explicit path — for absolute parity
    numbers on a networked eval host.

Asset layout (documented in docs/EVAL_ASSETS.md):
  $UNIDISC_ASSETS/clip-vit-large-patch14/   (HF CLIPModel dir)
  $UNIDISC_ASSETS/gpt2-large/               (HF causal LM dir)
  $UNIDISC_ASSETS/pt_inception-2015-12-05.pt (pytorch-fid weights)
"""

from __future__ import annotations

import math
import os
from collections import Counter, defaultdict
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


def assets_dir(path: Optional[str] = None) -> Optional[str]:
    path = path or os.environ.get("UNIDISC_ASSETS")
    return path if path and os.path.isdir(path) else None


# ---------------------------------------------------------------------------
# CIDEr-D (native; reference wires pycocoevalcap's CIDEr — captioning eval,
# model_setup.py:236-247)
# ---------------------------------------------------------------------------

def _ngrams(tokens: List[str], n: int) -> Counter:
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _tokenize(text: str) -> List[str]:
    return text.lower().strip().split()


def cider_d(candidates: Sequence[str],
            references: Sequence[Sequence[str]],
            max_n: int = 4, sigma: float = 6.0) -> float:
    """CIDEr-D over a corpus (Vedantam et al. 2015, the -D variant with
    count clipping + length penalty, matching pycocoevalcap semantics).

    candidates: one generated caption per image.
    references: list of reference captions per image.
    Returns the corpus CIDEr-D score (typically 0..~2, scaled by 10).
    """
    assert len(candidates) == len(references) and len(candidates) > 0
    num_images = len(candidates)

    # document frequency: number of images where the ngram appears in ANY ref
    df = [defaultdict(float) for _ in range(max_n)]
    ref_grams = []
    for refs in references:
        per_image = [[_ngrams(_tokenize(r), n + 1) for r in refs]
                     for n in range(max_n)]
        ref_grams.append(per_image)
        for n in range(max_n):
            seen = set()
            for g in per_image[n]:
                seen.update(g.keys())
            for ng in seen:
                df[n][ng] += 1.0

    log_n = math.log(max(num_images, 2))

    def tfidf(grams: Counter, n: int):
        vec = {}
        norm = 0.0
        total = max(sum(grams.values()), 1)
        for ng, cnt in grams.items():
            idf = log_n - math.log(max(df[n][ng], 1.0))
            w = (cnt / 1.0) * idf  # raw counts, as pycocoevalcap
            vec[ng] = w
            norm += w * w
        return vec, math.sqrt(norm)

    scores = np.zeros(num_images)
    for i, (cand, refs) in enumerate(zip(candidates, references)):
        cand_toks = _tokenize(cand)
        per_n = []
        for n in range(max_n):
            cgrams = _ngrams(cand_toks, n + 1)
            s = 0.0
            for ref, rgrams in zip(refs, ref_grams[i][n]):
                cvec, cnorm = tfidf(cgrams, n)
                rvec, rnorm = tfidf(rgrams, n)
                # CIDEr-D: clip candidate counts to the reference's
                num = 0.0
                for ng, w in cvec.items():
                    if ng in rvec:
                        num += min(w, rvec[ng]) * rvec[ng]
                denom = cnorm * rnorm
                sim = num / denom if denom > 0 else 0.0
                dl = len(cand_toks) - len(_tokenize(ref))
                sim *= math.exp(-dl * dl / (2 * sigma ** 2))
                s += sim
            per_n.append(10.0 * s / max(len(refs), 1))
        scores[i] = np.mean(per_n)
    return float(scores.mean())


# ---------------------------------------------------------------------------
# MAUVE (native pipeline; reference: model_eval.py:1590-1733 uses the mauve
# package over GPT-2 features)
# ---------------------------------------------------------------------------

def bag_of_ngrams_features(texts: Sequence[str], dim: int = 512,
                           max_n: int = 3, seed: int = 0) -> np.ndarray:
    """Deterministic hashing embedder: char+word n-gram counts hashed into
    `dim` buckets, l2-normalized. Zero-asset stand-in for the GPT-2
    feature extractor — distributional differences in vocabulary and
    phrasing still register."""
    import zlib

    # zlib.crc32 is process-stable (Python's str hash() is salted per
    # process, which would make the metric irreproducible across runs)
    def h32(kind, n, payload):
        return zlib.crc32(f"{kind}|{n}|{seed}|{payload}".encode())

    feats = np.zeros((len(texts), dim), np.float64)
    for i, t in enumerate(texts):
        toks = _tokenize(t)
        for n in range(1, max_n + 1):
            for j in range(len(toks) - n + 1):
                h = h32("w", n, " ".join(toks[j:j + n]))
                feats[i, h % dim] += 1 if (h >> 16) & 1 else -1
        for n in (3, 5):
            s = t.lower()
            for j in range(len(s) - n + 1):
                h = h32("c", n, s[j:j + n])
                feats[i, h % dim] += 1 if (h >> 16) & 1 else -1
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    return feats / np.maximum(norms, 1e-12)


def mauve_from_features(p_feats: np.ndarray, q_feats: np.ndarray, *,
                        num_buckets: Optional[int] = None,
                        scaling: float = 5.0, seed: int = 25,
                        pca_var: float = 0.9) -> Dict[str, float]:
    """MAUVE (Pillutla et al. 2021): quantize both feature sets with joint
    k-means, then integrate the KL-divergence frontier.

    Returns {"mauve": area, "frontier_integral": fi}.
    """
    from sklearn.cluster import KMeans
    from sklearn.decomposition import PCA

    n_p, n_q = len(p_feats), len(q_feats)
    num_buckets = num_buckets or max(2, min(n_p, n_q) // 10)
    joint = np.concatenate([p_feats, q_feats], 0).astype(np.float64)
    joint = joint - joint.mean(0, keepdims=True)
    if joint.shape[1] > 1:
        pca = PCA(n_components=pca_var, svd_solver="full", random_state=seed)
        joint = pca.fit_transform(joint)
    km = KMeans(n_clusters=num_buckets, n_init=5, random_state=seed)
    labels = km.fit_predict(joint)
    p_hist = np.bincount(labels[:n_p], minlength=num_buckets).astype(float)
    q_hist = np.bincount(labels[n_p:], minlength=num_buckets).astype(float)
    p_hist /= p_hist.sum()
    q_hist /= q_hist.sum()

    def kl(a, b):
        nz = a > 0
        return float(np.sum(a[nz] * (np.log(a[nz]) - np.log(b[nz]))))

    lambdas = np.linspace(0, 1, 100)[1:-1]
    xs, ys = [1.0], [0.0]
    for lam in lambdas:
        r = lam * p_hist + (1 - lam) * q_hist
        xs.append(math.exp(-scaling * kl(q_hist, r)))
        ys.append(math.exp(-scaling * kl(p_hist, r)))
    xs.append(0.0)
    ys.append(1.0)
    xs, ys = np.asarray(xs), np.asarray(ys)
    order = np.argsort(xs)
    area = float(np.trapezoid(ys[order], xs[order]))
    return {"mauve": area, "num_buckets": num_buckets}


def mauve_score(p_texts: Sequence[str], q_texts: Sequence[str],
                feature_fn: Optional[Callable] = None,
                **kw) -> Dict[str, float]:
    """End-to-end MAUVE on texts. feature_fn defaults to the hashing
    embedder; pass a judge-LM embedder for reference parity."""
    feature_fn = feature_fn or bag_of_ngrams_features
    return mauve_from_features(np.asarray(feature_fn(p_texts)),
                               np.asarray(feature_fn(q_texts)), **kw)


# ---------------------------------------------------------------------------
# FID feature extractors
# ---------------------------------------------------------------------------

def random_conv_features(dim: int = 192, seed: int = 7,
                         image_size: int = 64) -> Callable:
    """Fixed-seed random conv feature net (JAX) — a weights-free extractor
    for Frechet tracking. Random conv features preserve enough image
    statistics that the Frechet distance over them tracks distribution
    drift (the point is a STABLE, reproducible relative metric; absolute
    FID parity needs the inception asset)."""
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    w1 = jax.random.normal(ks[0], (3, 3, 3, 32)) / math.sqrt(27)
    w2 = jax.random.normal(ks[1], (3, 3, 32, 64)) / math.sqrt(288)
    w3 = jax.random.normal(ks[2], (3, 3, 64, dim)) / math.sqrt(576)

    @jax.jit
    def feats(images):
        x = jnp.asarray(images, jnp.float32)
        if x.ndim == 3:
            x = x[None]
        # expect (B, H, W, 3) in [0, 1] (or [0,255] -> normalized)
        x = jnp.where(x.max() > 1.5, x / 255.0, x)
        x = jax.image.resize(x, (x.shape[0], image_size, image_size, 3),
                             "bilinear")
        for w in (w1, w2, w3):
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x)
        return x.mean((1, 2))  # global average pool -> (B, dim)

    return lambda images: np.asarray(feats(np.asarray(images)))


def inception_features(asset_path: Optional[str] = None) -> Callable:
    """pytorch-fid InceptionV3 features (pool3, 2048-d) from a local
    weights file — the reference's absolute-FID judge
    (model_eval.py:1275-1499). Asset-gated: zero egress here."""
    base = assets_dir(asset_path)
    path = None
    for cand in ([asset_path] if asset_path and os.path.isfile(
            asset_path) else []) + \
            ([os.path.join(base, "pt_inception-2015-12-05.pt")]
             if base else []):
        if cand and os.path.isfile(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(
            "inception FID weights not found; place pytorch-fid's "
            "pt_inception-2015-12-05.pt under $UNIDISC_ASSETS "
            "(see docs/EVAL_ASSETS.md)")
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, torch.nn.Module):
        net = sd  # scripted module (accepted for convenience)
    else:
        # pytorch-fid's published file IS a state_dict (torchvision
        # inception_v3 key layout) — load it into our architecture port
        # (eval/judge_nets.py FIDInceptionV3; round-3 VERDICT fix)
        from unidisc_tpu.eval.judge_nets import FIDInceptionV3
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        net = FIDInceptionV3()
        net.load_state_dict(sd)
    net.eval()

    def feats(images):
        x = torch.as_tensor(np.asarray(images, np.float32))
        if x.max() > 1.5:
            x = x / 255.0
        x = x.permute(0, 3, 1, 2)  # NHWC -> NCHW
        with torch.no_grad():
            out = net(x)
        out = out[0] if isinstance(out, (list, tuple)) else out
        return out.squeeze(-1).squeeze(-1).numpy()

    return feats


# ---------------------------------------------------------------------------
# CLIP score (asset-gated; reference: model_eval.py:1265)
# ---------------------------------------------------------------------------

def clip_score_fn(asset_path: Optional[str] = None) -> Callable:
    """Returns score(images (B,H,W,3), texts list[str]) -> (B,) cosine*100.
    Loads a local HF CLIP dir (clip-vit-large-patch14)."""
    base = assets_dir(asset_path)
    path = asset_path if asset_path and os.path.isdir(asset_path) else (
        os.path.join(base, "clip-vit-large-patch14") if base else None)
    if not path or not os.path.isdir(path):
        raise FileNotFoundError(
            "CLIP judge dir not found; place an HF clip-vit-large-patch14 "
            "directory under $UNIDISC_ASSETS (see docs/EVAL_ASSETS.md)")
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(path)
    processor = CLIPProcessor.from_pretrained(path)
    model.eval()

    def score(images, texts):
        ims = [np.asarray(im, np.uint8) for im in np.asarray(images)]
        inputs = processor(text=list(texts), images=ims,
                          return_tensors="pt", padding=True,
                          truncation=True)
        with torch.no_grad():
            out = model(**inputs)
        img = out.image_embeds / out.image_embeds.norm(dim=-1, keepdim=True)
        txt = out.text_embeds / out.text_embeds.norm(dim=-1, keepdim=True)
        return (100.0 * (img * txt).sum(-1)).numpy()

    return score


# ---------------------------------------------------------------------------
# LAION aesthetic v2 (asset-gated; reference:
# unidisc/tokenizers/laion_aesthetic_v2.py)
# ---------------------------------------------------------------------------

def laion_aesthetic_fn(asset_path: Optional[str] = None) -> Callable:
    """Returns score(images (B,H,W,3)) -> (B,) sigmoid aesthetic scores.

    Loads the published ava+logos-l14-linearMSE.pth MLP head
    (eval/judge_nets.AestheticPredictor) over CLIP ViT-L/14 image
    embeddings from the clip-vit-large-patch14 asset dir. Matches the
    reference's sigmoid(mlp(emb) - 5.6) scoring
    (laion_aesthetic_v2.py:45-62)."""
    base = assets_dir(asset_path)
    head_path = None
    for name in ("ava+logos-l14-linearMSE.pth",
                 "sac+logos+ava1-l14-linearMSE.pth"):
        cand = os.path.join(base, name) if base else None
        if cand and os.path.isfile(cand):
            head_path = cand
            break
    if head_path is None:
        raise FileNotFoundError(
            "LAION aesthetic head not found; place "
            "ava+logos-l14-linearMSE.pth under $UNIDISC_ASSETS "
            "(see docs/EVAL_ASSETS.md)")
    clip_dir = os.path.join(base, "clip-vit-large-patch14")
    if not os.path.isdir(clip_dir):
        raise FileNotFoundError(
            "LAION aesthetic needs the clip-vit-large-patch14 asset dir "
            "for image embeddings (see docs/EVAL_ASSETS.md)")
    import torch
    from transformers import CLIPModel, CLIPProcessor

    from unidisc_tpu.eval.judge_nets import AestheticPredictor

    sd = torch.load(head_path, map_location="cpu", weights_only=True)
    head = AestheticPredictor(sd["layers.0.weight"].shape[1])
    head.load_state_dict(sd)
    head.eval()
    clip = CLIPModel.from_pretrained(clip_dir)
    clip.eval()
    processor = CLIPProcessor.from_pretrained(clip_dir)

    def score(images):
        ims = [np.asarray(im, np.uint8) for im in np.asarray(images)]
        inputs = processor(images=ims, return_tensors="pt")
        with torch.no_grad():
            emb = clip.get_image_features(**inputs)
            emb = emb / emb.norm(dim=-1, keepdim=True)
            raw = head(emb.float())[:, 0] - 5.6
        return 1.0 / (1.0 + np.exp(-raw.numpy()))

    return score


# ---------------------------------------------------------------------------
# HPSv2 (asset-gated; reference: unidisc/tokenizers/hpsv2_img_score.py)
# ---------------------------------------------------------------------------

def hpsv2_fn(asset_path: Optional[str] = None) -> Callable:
    """Returns score(images (B,H,W,3), prompts list[str]) -> (B,) HPS.

    Loads the published HPSv2 checkpoint (an open_clip ViT-H-14
    state_dict under 'state_dict') into our open_clip-compatible
    implementation (eval/judge_nets.OpenClipModel — tower sizes are read
    off the checkpoint, so smaller test checkpoints also load). Text uses
    the CLIP BPE tokenizer from the clip-vit-large-patch14 asset dir
    (identical vocab across CLIP models). HPS = image_feat . text_feat
    of the finetuned model (hpsv2_img_score.py:70-76)."""
    base = assets_dir(asset_path)
    ckpt = None
    for name in ("HPS_v2.1_compressed.pt", "HPS_v2_compressed.pt",
                 "HPS_v2.pt"):
        cand = os.path.join(base, name) if base else None
        if cand and os.path.isfile(cand):
            ckpt = cand
            break
    if ckpt is None:
        raise FileNotFoundError(
            "HPSv2 checkpoint not found; place HPS_v2_compressed.pt "
            "under $UNIDISC_ASSETS (see docs/EVAL_ASSETS.md)")
    tok_dir = os.path.join(base, "clip-vit-large-patch14")
    if not os.path.isdir(tok_dir):
        raise FileNotFoundError(
            "HPSv2 needs the clip-vit-large-patch14 asset dir for the "
            "CLIP BPE tokenizer (see docs/EVAL_ASSETS.md)")
    import torch
    from transformers import CLIPTokenizer

    from unidisc_tpu.eval.judge_nets import OpenClipModel

    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    model = OpenClipModel.from_state_dict(sd)
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
    ctx = model.positional_embedding.shape[0]
    size = model.visual.conv1.weight.shape[-1] * int(round(
        (model.visual.positional_embedding.shape[0] - 1) ** 0.5))
    # open_clip val preprocess: resize+center-crop to the tower's input
    # size, CLIP mean/std normalization
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def score(images, prompts):
        x = np.asarray(images, np.float32)
        if x.max() > 1.5:
            x = x / 255.0
        x = torch.as_tensor((x - mean) / std).permute(0, 3, 1, 2)
        if x.shape[-2:] != (size, size):
            x = torch.nn.functional.interpolate(
                x, size=(size, size), mode="bicubic", align_corners=False)
        toks = tokenizer(list(prompts), return_tensors="pt",
                         padding="max_length", truncation=True,
                         max_length=ctx).input_ids
        with torch.no_grad():
            out = model(x, toks)
        return (out["image_features"]
                * out["text_features"]).sum(-1).numpy()

    return score


# ---------------------------------------------------------------------------
# Generative perplexity judge LM (asset-gated; reference:
# model_utils.py:514-603 gen-PPL vs GPT-2-large)
# ---------------------------------------------------------------------------

def judge_lm(asset_path: Optional[str] = None, name: str = "gpt2-large"):
    """Returns (nll_fn(texts) -> (B,) mean NLL, embed_fn(texts) -> (B, D))
    from a local HF causal-LM directory. embed_fn feeds MAUVE for
    reference-parity features."""
    base = assets_dir(asset_path)
    path = asset_path if asset_path and os.path.isdir(asset_path) else (
        os.path.join(base, name) if base else None)
    if not path or not os.path.isdir(path):
        raise FileNotFoundError(
            f"judge LM dir '{name}' not found under $UNIDISC_ASSETS "
            "(see docs/EVAL_ASSETS.md)")
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path)
    model = AutoModelForCausalLM.from_pretrained(path)
    model.eval()
    if tok.pad_token is None:
        tok.pad_token = tok.eos_token

    def nll_fn(texts):
        out = []
        with torch.no_grad():
            for t in texts:
                ids = tok(t, return_tensors="pt",
                          truncation=True).input_ids
                logits = model(ids).logits[:, :-1]
                tgt = ids[:, 1:]
                lp = torch.log_softmax(logits, -1)
                nll = -lp.gather(-1, tgt[..., None])[..., 0].mean()
                out.append(float(nll))
        return np.asarray(out)

    def embed_fn(texts):
        out = []
        with torch.no_grad():
            for t in texts:
                ids = tok(t, return_tensors="pt",
                          truncation=True).input_ids
                h = model(ids, output_hidden_states=True).hidden_states[-1]
                out.append(h[0, -1].numpy())
        return np.stack(out)

    return nll_fn, embed_fn
