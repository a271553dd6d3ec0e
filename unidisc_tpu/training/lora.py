"""LoRA fine-tuning — low-rank adapters as a pure parameter transform.

TPU-native equivalent of the reference's peft integration
(reference: model_setup.py:175-188 — LoraConfig(r=16, lora_alpha=32,
target_modules=["qkv_proj"], bias="none") wrapped around the ELM backbone,
with token_embeddings_extra / lm_extra kept fully trainable).

Design (no module surgery, unlike peft's wrapper classes): adapters live in
a SEPARATE small pytree mirroring the base tree's structure only at matched
kernels; a pure function merges `W + (alpha/rank) * A @ B` into a full
parameter tree. The train step's differentiated argument is the adapter
tree alone — the base tree is a closed-over constant, so gradients,
optimizer state, and EMA are all rank-r sized, and the backbone forward is
the unchanged full-weight path (one merged matmul per target — on TPU this
beats peft's two-matmul `x@W + x@A@B` decomposition because the merge is a
tiny rank-r outer product per step while the split path doubles the hot
matmul dispatches and breaks the int8/XLA fusion of the main dot).

Matched leaves:
  * 2D kernels (in, out)           -> a: (in, r),    b: (r, out)
  * scan-stacked (L, in, out)      -> a: (L, in, r), b: (L, r, out)
    (the DIT block stack, models/dit.py scan over `blocks`)
  * `train_full` patterns          -> zero-init full-shape DELTA (base +
    delta), gradient-equivalent to training the leaf itself — mirrors the
    reference's requires_grad_(True) on token_embeddings_extra / lm_extra
    (model_setup.py:186-188).

Default targets cover both backbones: "attn_qkv" (DIT,
blocks/attention/attn_qkv/kernel) and "qkv_proj" (ELM,
layer_i/attn/qkv_proj/kernel — the reference's target_modules).

Deliberate deviation from the reference peft config: `lora_dropout=0.05`
(model_setup.py:181) is NOT implemented — it drops the adapter branch's
input activations (`W·x + s·B·A·dropout(x)`), which requires the
two-matmul split this design intentionally avoids; weight decay on the
adapter tree is the supported regularizer (see docs/TRAIN.md).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

DEFAULT_TARGETS = ("attn_qkv", "qkv_proj")


def _path_str(path: Tuple[str, ...]) -> str:
    return "/".join(path)


def _is_target(path: Tuple[str, ...], leaf, targets: Sequence[str]) -> bool:
    return (path[-1] == "kernel" and leaf.ndim in (2, 3)
            and any(t in _path_str(path) for t in targets))


def _is_full(path: Tuple[str, ...], patterns: Sequence[str]) -> bool:
    p = _path_str(path)
    return any(t in p for t in patterns)


def init_lora(rng, base_params: Any, *, rank: int = 16,
              targets: Sequence[str] = DEFAULT_TARGETS,
              train_full: Sequence[str] = ()) -> Dict:
    """Build the adapter tree: {"lora": {path: {"a","b"}}, "full": {path}}.

    a ~ N(0, 1/rank) (the LoRA paper's kaiming-class init on the down
    projection), b = 0 — so the merged model is EXACTLY the base model at
    init. Full-pattern leaves get zero deltas.
    """
    flat = traverse_util.flatten_dict(base_params)
    lora, full = {}, {}
    keys = jax.random.split(rng, max(1, len(flat)))
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        if _is_target(path, leaf, targets):
            if leaf.ndim == 2:
                din, dout = leaf.shape
                a_shape, b_shape = (din, rank), (rank, dout)
            else:  # (L, in, out) scan-stacked
                nl, din, dout = leaf.shape
                a_shape, b_shape = (nl, din, rank), (nl, rank, dout)
            lora[path] = {
                "a": (jax.random.normal(keys[i], a_shape, jnp.float32)
                      / np.sqrt(rank)),
                "b": jnp.zeros(b_shape, jnp.float32),
            }
        elif train_full and _is_full(path, train_full):
            full[path] = jnp.zeros_like(leaf)
    if not lora and not full:
        raise ValueError(
            f"no parameters matched LoRA targets {tuple(targets)} / "
            f"train_full {tuple(train_full)}")
    return {"lora": traverse_util.unflatten_dict(lora),
            "full": traverse_util.unflatten_dict(full)}


def merge_lora(base_params: Any, adapter: Dict, *,
               alpha: float = 32.0, rank: int = 16) -> Any:
    """Pure merge: base kernel + (alpha/rank) * a @ b (+ full deltas).

    Differentiable in `adapter`; `base_params` flows through unchanged
    (close over it / stop_gradient outside if training only the adapter).
    """
    scale = alpha / rank
    flat = dict(traverse_util.flatten_dict(base_params))
    lora_flat = traverse_util.flatten_dict(adapter.get("lora", {}))
    # lora_flat keys end with ("a",) / ("b",): group them by kernel path
    grouped: Dict[Tuple[str, ...], Dict[str, Any]] = {}
    for path, leaf in lora_flat.items():
        grouped.setdefault(path[:-1], {})[path[-1]] = leaf
    for kpath, ab in grouped.items():
        base = flat[kpath]
        a, b = ab["a"], ab["b"]
        if base.ndim == 2:
            delta = a @ b
        else:
            delta = jnp.einsum("lir,lro->lio", a, b)
        flat[kpath] = (base + scale * delta.astype(base.dtype)).astype(
            base.dtype)
    for path, delta in traverse_util.flatten_dict(
            adapter.get("full", {})).items():
        flat[path] = flat[path] + delta.astype(flat[path].dtype)
    return traverse_util.unflatten_dict(flat)


def lora_param_map(base_params: Any, *, alpha: float = 32.0,
                   rank: int = 16):
    """fn(adapter) -> full params, with the base tree held constant —
    plug into make_train_step(param_map=...) so state.params IS the
    adapter tree (rank-r optimizer state / EMA / checkpoints)."""
    frozen = jax.lax.stop_gradient(base_params)

    def pmap(adapter):
        return merge_lora(frozen, adapter, alpha=alpha, rank=rank)
    return pmap


def lora_from_config(rng, base_params, model_cfg):
    """Config-driven init: uses model.lora_rank/alpha/targets/train_full."""
    return init_lora(rng, base_params, rank=model_cfg.lora_rank,
                     targets=model_cfg.lora_targets,
                     train_full=model_cfg.lora_train_full)


def count_lora_params(adapter: Dict) -> int:
    return sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(adapter))


# ---------------------------------------------------------------------------
# Adapter IO — tiny npz files (an adapter is KBs-MBs, not GBs; no Orbax
# machinery needed). Keys are "<kind>|<slash/path>".
# ---------------------------------------------------------------------------

def save_lora(path: str, adapter: Dict, *, alpha: float, rank: int) -> None:
    flat = {}
    for kind in ("lora", "full"):
        for p, leaf in traverse_util.flatten_dict(
                adapter.get(kind, {})).items():
            flat[f"{kind}|{'/'.join(p)}"] = np.asarray(leaf)
    flat["__meta__"] = np.array([alpha, float(rank)], np.float64)
    np.savez(path, **flat)


def load_lora(path: str) -> Tuple[Dict, float, int]:
    """Returns (adapter, alpha, rank)."""
    z = np.load(path)
    out = {"lora": {}, "full": {}}
    for key in z.files:
        if key == "__meta__":
            continue
        kind, p = key.split("|", 1)
        out[kind][tuple(p.split("/"))] = jnp.asarray(z[key])
    alpha, rank = z["__meta__"]
    return ({"lora": traverse_util.unflatten_dict(out["lora"]),
             "full": traverse_util.unflatten_dict(out["full"])},
            float(alpha), int(rank))
