"""Mixture-of-Experts MLP with expert parallelism (BEYOND the reference).

The reference has no MoE (SURVEY §2.6: "EP (expert parallel) — absent");
this is a TPU-native capacity-routed MoE in the Switch/GShard style,
designed for GSPMD:

  * routing is DENSE and static-shaped: top-k gates become (S, E, C)
    dispatch/combine one-hot tensors (S tokens, E experts, C capacity
    slots), so the whole layer is three einsums + a vmapped-by-stacking
    expert MLP — no gather/scatter, no dynamic shapes, jit/scan/remat
    friendly;
  * expert weights are STACKED on a leading E axis and sharded over the
    'ep' mesh axis (parallel/mesh.py param_spec); the dispatch einsum
    (tokens sharded over batch -> activations sharded over experts) and
    the combine einsum lower to XLA all_to_alls over ICI under GSPMD;
  * overflow tokens (beyond each expert's capacity C) contribute ZERO to
    the MLP branch and fall through on the residual stream — one_hot of
    an out-of-range slot index is the zero row, so no masking pass is
    needed;
  * the router runs in fp32; the balance auxiliary is the Switch loss
    E * sum_e f_e * P_e over the top-1 assignments (f_e = routed token
    fraction, P_e = mean router probability), added to the training loss
    with trainer.moe_aux_weight. The router ALSO learns from the main
    loss through the combine gates.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from unidisc_tpu.config import ModelConfig

Dtype = Any


class MoEMLP(nn.Module):
    """Drop-in replacement for the DDiTBlock MLP (mlp_0/gelu/mlp_2) when
    model.moe_experts > 0. Returns (y, aux) where y has the input shape
    and aux is the scalar load-balance loss for this layer."""

    cfg: ModelConfig
    compute_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        E, k = cfg.moe_experts, min(cfg.moe_top_k, cfg.moe_experts)
        dim = cfg.hidden_size
        ff = cfg.mlp_ratio * dim
        b, t, _ = x.shape
        s = b * t
        cap = max(1, int(math.ceil(cfg.moe_capacity_factor * k * s / E)))
        cap = min(cap, s)
        xr = x.reshape(s, dim)

        logits = nn.Dense(E, use_bias=False, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          name="router")(xr.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (S, E) fp32
        gates, expert_idx = jax.lax.top_k(probs, k)  # (S, k)
        gates = gates / jnp.maximum(gates.sum(-1, keepdims=True), 1e-9)

        # position-in-expert with choice-major priority (all tokens'
        # first choices claim slots before any second choice), matching
        # GShard's priority ordering
        oh_e = jax.nn.one_hot(expert_idx, E, dtype=jnp.int32)  # (S, k, E)
        flat = oh_e.transpose(1, 0, 2).reshape(k * s, E)
        pos = jnp.cumsum(flat, axis=0) - flat
        pos_in_e = (pos * flat).sum(-1).reshape(k, s).transpose(1, 0)
        # one_hot(pos >= cap) is the zero row => overflow tokens simply
        # drop out of dispatch AND combine
        oh_c = jax.nn.one_hot(pos_in_e, cap, dtype=jnp.float32)  # (S, k, C)

        cdt = self.compute_dtype
        oh_ef = oh_e.astype(jnp.float32)
        # a token's k experts are distinct, so entries never collide
        dispatch = jnp.einsum("ske,skc->sec", oh_ef, oh_c).astype(cdt)
        combine = jnp.einsum("ske,skc,sk->sec", oh_ef, oh_c,
                             gates.astype(jnp.float32)).astype(cdt)

        w1 = self.param("w1", nn.initializers.lecun_normal(
            batch_axis=(0,)), (E, dim, ff), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (E, 1, ff),
                        jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(
            batch_axis=(0,)), (E, ff, dim), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros, (E, 1, dim),
                        jnp.float32)

        expert_in = jnp.einsum("sec,sd->ecd", dispatch, xr.astype(cdt))
        h = jnp.einsum("ecd,edf->ecf", expert_in, w1.astype(cdt),
                       preferred_element_type=jnp.float32)
        h = nn.gelu(h.astype(jnp.float32) + b1, approximate=True)
        out = jnp.einsum("ecf,efd->ecd", h.astype(cdt), w2.astype(cdt),
                         preferred_element_type=jnp.float32) + b2
        y = jnp.einsum("sec,ecd->sd", combine, out.astype(cdt))

        # Switch load-balance loss over top-1 assignments
        f_e = oh_ef[:, 0, :].mean(axis=0)          # routed fraction
        p_e = probs.mean(axis=0)                    # mean router prob
        aux = E * jnp.sum(f_e * p_e)
        return y.reshape(b, t, dim).astype(cdt), aux
