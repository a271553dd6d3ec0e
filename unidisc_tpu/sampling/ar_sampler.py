"""Autoregressive decode loop with a sharded KV cache.

TPU-native replacement for the reference's token-by-token Python loop
(reference: model_eval.py:2736-2822 _ar_sampler; KV cache
models/dit.py:588-608): the whole decode trajectory is ONE `lax.scan` over
positions — per step the DIT consumes a single token, reads/writes the
per-layer KV cache carried through the scan, and samples the next token
(Gumbel-argmax or nucleus), with optional CFG via a doubled batch whose
unconditional rows re-mask the conditioning.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.subs import NEG_INFINITY, restrict_modality_logits
from unidisc_tpu.sampling.sampler import SampleResult


def init_kv_cache(n_blocks: int, batch: int, max_len: int, n_heads: int,
                  head_dim: int, dtype=jnp.bfloat16, quant: bool = False):
    """(k, v) cache, each (n_blocks, B, max_len, H, D)
    (reference alloc: models/dit.py:595-608 reset_kv_cache).

    With quant=True (model.kv_cache_dtype == "int8"): a 4-tuple
    (k_q, k_scale, v_q, v_scale) — int8 values + per-(pos, head) f32
    scales; the DIT cached branch reads it with int8 MXU dots
    (ops/quant.int8_kv_attention). Halves the cache traffic that
    dominates large-batch decode."""
    shape = (n_blocks, batch, max_len, n_heads, head_dim)
    if quant:
        sshape = (n_blocks, batch, max_len, n_heads, 1)
        return (jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
                jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def init_kv_cache_for(m, batch: int, max_len: Optional[int] = None):
    """Config-aware cache alloc: m is a ModelConfig."""
    return init_kv_cache(m.n_blocks, batch, max_len or m.length,
                         m.n_heads, m.head_dim,
                         quant=getattr(m, "kv_cache_dtype", "bf16")
                         == "int8")


def build_ar_sampler(apply_token: Callable, config: Config) -> Callable:
    """Build a jittable AR decode fn.

    Args:
      apply_token: fn(params, tok, kv_cache, cache_index, modality_tok)
        -> (logits (B, 1, V), new_kv_cache). One-token DIT call with cache.
      config: sampling.cfg enables CFG; sampling.top_p enables nucleus.

    Returns:
      sample(params, rng, x0, x0_unmask, modality) -> SampleResult
        x0: (B, L) tokens; positions with x0_unmask=True are forced to x0
        (prompt / infilling conditioning); the rest are generated
        left-to-right. modality: (B, L) 0/1.
    """
    m = config.model
    s = config.sampling
    mask_index = m.mask_index
    use_cfg = s.cfg is not None

    def sample(params, rng, x0, x0_unmask, modality=None, injected=None):
        b, l = x0.shape
        if modality is None:
            modality = jnp.zeros((b, l), jnp.int32)

        if use_cfg:
            # rows [0:b] conditional, [b:2b] unconditional (conditioning
            # re-masked; reference: model_eval.py:2760-2784)
            x_init = jnp.where(x0_unmask, x0, mask_index)
            x_full = jnp.concatenate(
                [x_init, jnp.full_like(x_init, mask_index)], axis=0)
            modality_full = jnp.concatenate([modality, modality], axis=0)
            # uncond rows re-mask the conditioning EVERY step (reference:
            # model_eval.py:2780 `_x[B:] = where(x0_unmask, mask, x)`) —
            # forced positions write x0 into cond rows and mask_index into
            # uncond rows, so logit_u never conditions on the prompt.
            unmask_full = jnp.concatenate([x0_unmask, x0_unmask], axis=0)
            x0_full = jnp.concatenate(
                [x0, jnp.full_like(x0, mask_index)], axis=0)
            bb = 2 * b
        else:
            x_full = jnp.where(x0_unmask, x0, mask_index)
            modality_full = modality
            unmask_full = x0_unmask
            x0_full = x0
            bb = b

        kv = init_kv_cache_for(m, bb, l)

        if use_cfg and not s.force_cfg_value:
            # anneal fraction over PREDICTED tokens (reference
            # model_eval.py:2782-2784: get_cfg_weight(1 - i/num_pred),
            # i counting prediction steps — NOT absolute position, which
            # would start a prompted row mid-anneal)
            pred_rank = jnp.cumsum(~x0_unmask, axis=1)        # 1-based
            num_pred = jnp.maximum((~x0_unmask).sum(-1), 1
                                   ).astype(jnp.float32)      # (b,)

        rng_g, rng_n = jax.random.split(rng)

        def body(carry, i):
            x, kv = carry
            tok = jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)
            mod_tok = jax.lax.dynamic_slice_in_dim(modality_full, i, 1, axis=1)
            logits, kv = apply_token(params, tok, kv, i, mod_tok)
            logits = logits[:, 0, :].astype(jnp.float32)  # (bb, V)

            # next-position modality decides the valid vocab slice
            nxt = jnp.minimum(i + 1, l - 1)
            mod_next = jax.lax.dynamic_slice_in_dim(
                modality_full, nxt, 1, axis=1)[:, 0]
            ids = jnp.arange(logits.shape[-1])
            logits = logits + jnp.where(ids == mask_index, NEG_INFINITY, 0.0)
            if m.force_argmax_valid_indices:
                logits = restrict_modality_logits(
                    logits, mod_next, m.text_vocab_size)

            if use_cfg:
                lc, lu = jnp.split(logits, 2, axis=0)
                if s.force_cfg_value:
                    # constant weight — the only RUNNABLE reference AR+CFG
                    # config (eval.force_cfg_value; the annealed float-t
                    # call crashes upstream, model_eval.py:1746)
                    w = jnp.full((b, 1), s.cfg, jnp.float32)
                else:
                    # the reference's INTENDED time-annealed weight,
                    # w(1 - i/num_pred) (model_eval.py:2782), fixed to
                    # actually run; the step index is this position's rank
                    # among the row's PREDICTED tokens
                    from unidisc_tpu.sampling.sampler import guidance_weight
                    pr = jax.lax.dynamic_slice_in_dim(
                        pred_rank, nxt, 1, axis=1)[:, 0]
                    t_i = 1.0 - (pr - 1).astype(jnp.float32) / num_pred
                    w = guidance_weight(s, jnp.clip(t_i, 0.0, 1.0))[:, None]
                logits_b = (1 + w) * lc - w * lu
            else:
                logits_b = logits

            def _inj(name):
                if injected is None or name not in injected:
                    return None
                return injected[name][i]

            if s.top_p is not None and s.temperature > 0:
                probs = jax.nn.softmax(logits_b / s.temperature, axis=-1)
                from unidisc_tpu.sampling.sampler import nucleus_sample
                next_tok = nucleus_sample(
                    jax.random.fold_in(rng_n, i), probs, s.top_p,
                    exp_noise=_inj("exp"))
            elif s.temperature <= 0:
                # temperature 0 is greedy decode regardless of top_p —
                # the zero-temperature limit of nucleus sampling is the
                # argmax, not temperature-1 nucleus draws
                next_tok = jnp.argmax(logits_b, axis=-1)
            else:
                # Gumbel-argmax categorical sampling at temperature
                # (reference draws Gumbel over the full vocab per step,
                # model_eval.py:2764,2800-2802). Per-step fold_in instead of
                # a precomputed (L, B, V) tensor — that would be ~L*B*48k
                # floats of HBM for noise XLA can fuse into the argmax.
                g = _inj("gumbel")
                if g is None:
                    g = jax.random.gumbel(jax.random.fold_in(rng_g, i),
                                          logits_b.shape,
                                          dtype=logits_b.dtype)
                next_tok = jnp.argmax(logits_b / s.temperature + g,
                                      axis=-1)

            if use_cfg:
                next_tok = jnp.concatenate([next_tok, next_tok], axis=0)

            # teacher-force conditioned positions
            forced = jax.lax.dynamic_slice_in_dim(unmask_full, nxt, 1,
                                                  axis=1)[:, 0]
            given = jax.lax.dynamic_slice_in_dim(x0_full, nxt, 1, axis=1)[:, 0]
            next_tok = jnp.where(forced, given, next_tok).astype(x.dtype)
            x = jax.lax.dynamic_update_slice(x, next_tok[:, None], (0, nxt))
            return (x, kv), None

        (x_full, _), _ = jax.lax.scan(body, (x_full, kv), jnp.arange(l - 1))
        tokens = x_full[:b]
        return SampleResult(tokens=tokens, nfe=jnp.int32(l - 1))

    return sample


def make_apply_token(model):
    """Adapt DIT.apply to the one-token cached-decode signature."""
    def apply_token(params, tok, kv_cache, cache_index, modality_tok):
        sigma = jnp.zeros((tok.shape[0],), jnp.float32)
        return model.apply({"params": params}, tok, sigma,
                           modality=modality_tok, kv_cache=kv_cache,
                           cache_index=cache_index)
    return apply_token
