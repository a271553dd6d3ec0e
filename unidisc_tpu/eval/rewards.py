"""Reward models for generation re-ranking.

Redesign of the reference reward battery
(reference: model_eval.py:3466-3706 get_rewards / get_*_score — CLIP score,
DFN, HPSv2, LAION-aesthetic, chameleon perplexity, model likelihood, text
reward). The torch-ecosystem judges (CLIP/HPSv2/LAION/chameleon) need
downloaded weights; they register here as *pluggable scorers* with clear
errors when their assets are absent, while the model-likelihood and
heuristic scorers run natively on TPU.

All scorers share one signature: score(batch: dict) -> (B,) float, where
batch carries whichever of tokens/images/texts the scorer needs.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_scorer(name: str, **kw) -> Callable:
    if name not in _REGISTRY:
        raise KeyError(f"unknown reward {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kw)


def combine(scorers: Sequence, weights: Optional[Sequence[float]] = None):
    """Weighted reward mixture (reference reward_config weighting)."""
    weights = weights or [1.0] * len(scorers)

    def score(batch):
        total = None
        for s, w in zip(scorers, weights):
            v = np.asarray(s(batch), np.float64) * w
            total = v if total is None else total + v
        return total
    return score


# ---------------------------------------------------------------------------
# native scorers
# ---------------------------------------------------------------------------

@register("model_likelihood")
def _model_likelihood(*, config, apply_fn, params, rng, n_timesteps=4):
    from unidisc_tpu.eval.harness import sequence_nll

    def score(batch):
        return -np.asarray(sequence_nll(config, apply_fn, params,
                                        batch, rng,
                                        n_timesteps=n_timesteps))
    return score


@register("token_entropy")
def _token_entropy(*, vocab_size):
    def score(batch):
        toks = np.asarray(batch["input_ids"])
        out = []
        for row in toks:
            counts = np.bincount(row, minlength=vocab_size).astype(float)
            p = counts / counts.sum()
            p = p[p > 0]
            out.append(float(-(p * np.log(p)).sum()))
        return np.asarray(out)
    return score


@register("image_diversity")
def _image_diversity():
    """Unique-token fraction in the image span — a cheap degeneracy guard."""
    def score(batch):
        toks = np.asarray(batch["image_ids"])
        return np.asarray([len(np.unique(r)) / r.size for r in toks])
    return score


# ---------------------------------------------------------------------------
# torch-ecosystem judges (offline assets required)
# ---------------------------------------------------------------------------

def _needs_assets(name: str, hint: str):
    @register(name)
    def factory(**kw):
        def score(batch):
            raise RuntimeError(
                f"reward '{name}' needs downloaded judge weights ({hint}); "
                f"run it offline on the eval host, or use a native scorer "
                f"(model_likelihood, token_entropy, image_diversity)")
        return score
    return factory


@register("clip")
def _clip(*, assets=None, **kw):
    """CLIP text-image alignment reward — lazily loads the judge from the
    local asset dir on first call (eval/judges.py protocol); raises with
    guidance when the assets are missing."""
    state = {}

    def score(batch):
        if "fn" not in state:
            from unidisc_tpu.eval.judges import clip_score_fn
            try:
                state["fn"] = clip_score_fn(assets)
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"reward 'clip' needs downloaded judge weights: {e}"
                ) from e
        return state["fn"](batch["images"], batch["texts"])
    return score


@register("hpsv2")
def _hpsv2(*, assets=None, **kw):
    """Human Preference Score v2 (reference:
    unidisc/tokenizers/hpsv2_img_score.py) — lazily loads the open_clip
    ViT-H-14 HPSv2 checkpoint into eval/judge_nets.OpenClipModel."""
    state = {}

    def score(batch):
        if "fn" not in state:
            from unidisc_tpu.eval.judges import hpsv2_fn
            try:
                state["fn"] = hpsv2_fn(assets)
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"reward 'hpsv2' needs downloaded judge weights: {e}"
                ) from e
        return state["fn"](batch["images"], batch["texts"])
    return score


@register("laion_aesthetic")
def _laion_aesthetic(*, assets=None, **kw):
    """LAION aesthetic v2 (reference:
    unidisc/tokenizers/laion_aesthetic_v2.py) — MLP head over CLIP
    ViT-L/14 embeddings, sigmoid(mlp(emb) - 5.6)."""
    state = {}

    def score(batch):
        if "fn" not in state:
            from unidisc_tpu.eval.judges import laion_aesthetic_fn
            try:
                state["fn"] = laion_aesthetic_fn(assets)
            except FileNotFoundError as e:
                raise RuntimeError(
                    f"reward 'laion_aesthetic' needs downloaded judge "
                    f"weights: {e}") from e
        return state["fn"](batch["images"])
    return score


_needs_assets("dfn", "DFN CLIP checkpoint")
_needs_assets("chameleon_perplexity", "Anole-7b; reference: "
              "unidisc/tokenizers/chameleon_tokenizers.py")
