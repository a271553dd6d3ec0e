"""muP (maximal-update parameterization) hyperparameter transfer.

TPU-native replacement for the reference's mup-package integration
(reference: model.mup flag, get_base_shapes_for_mup at model_setup.py:163,
MuAdam wrapping at model_setup.py:416-418, and the mup_coord_plot check at
model_setup.py:709). Instead of patching optimizer classes and storing base
shapes, we apply the MuAdam rule explicitly as an optax transform: for
Adam-like optimizers, every width-scaled matrix gets its learning rate
multiplied by base_width/width; vectors (biases, norms), scalars and
vocabulary embeddings keep the full LR.

Our DiT is already muP-friendly on the model side: the logit head is
zero-initialized (config.zero_linear_init — the common muP output-layer
practice) and QK-RMSNorm removes the 1/sqrt(d) vs 1/d attention-scale
sensitivity that the mup package patches in torch.

``coord_check`` implements the standard muP validation (the reference's
mup_coord_plot): average activation magnitude across widths should stay
O(1) under muP scaling while it grows with width under standard
parameterization.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax

from unidisc_tpu.config import Config


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path).lower()


def mup_multiplier(path, param, *, base_width: int, width: int) -> float:
    """Per-parameter LR multiplier under the MuAdam rule.

    Width-scaled matrices (fan_in proportional to hidden size) get
    base/width; embeddings (fan_in = vocab), vectors and scalars get 1.
    Matrices are identified structurally: ndim >= 2 and a last-but-one
    (fan_in) dimension that is a multiple of the width — vocabulary tables
    have fan_in = vocab_size which is not width-proportional, and are also
    excluded by name.
    """
    if param.ndim < 2:
        return 1.0
    name = _path_str(path)
    if "embed" in name or "vocab" in name:
        return 1.0
    fan_in = param.shape[-2]
    if fan_in % width != 0 and width % fan_in != 0:
        return 1.0
    return base_width / width


def mup_lr_scale(config: Config) -> optax.GradientTransformation:
    """Optax transform scaling final updates per-parameter (equivalent to
    per-parameter LR for any optimizer whose update precedes this in the
    chain). Chain it AFTER the base optimizer."""
    m = config.model

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        updates = jax.tree_util.tree_map_with_path(
            lambda path, u: u * mup_multiplier(
                path, u, base_width=m.mup_base_width, width=m.hidden_size),
            updates)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def coord_check(make_model_and_params, widths: Sequence[int],
                batch: Any, *, config: Config) -> dict:
    """muP coordinate check (reference mup_coord_plot, model_setup.py:709).

    make_model_and_params(width) -> (apply_fn, params); returns per-width
    mean |activation| of the final hidden state after ONE muP-scaled SGD
    step on `batch` — under correct muP these stay O(1) across widths.
    """
    out = {}
    for w in widths:
        apply_fn, params = make_model_and_params(w)

        def loss_fn(p):
            h = apply_fn(p, batch)
            return (h ** 2).mean(), h

        (loss, h0), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        lr = 0.1
        params = jax.tree_util.tree_map_with_path(
            lambda path, p, g: p - lr * mup_multiplier(
                path, p, base_width=config.model.mup_base_width,
                width=w) * g,
            params, grads)
        h1 = apply_fn(params, batch)
        out[w] = {"act_before": float(jnp.abs(h0).mean()),
                  "act_after": float(jnp.abs(h1).mean()),
                  "delta": float(jnp.abs(h1 - h0).mean())}
    return out
