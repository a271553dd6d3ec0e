"""OpenELM-style AR language model in Flax (the reference's AR baseline).

Ground-up Flax re-design of the reference's forked Apple OpenELM
(reference: models/elm_custom.py — OpenELMForCausalLM:832, OpenELMModel:549,
OpenELMDecoderLayer:478; UniDisc extensions: extra-token embedding + lm_extra
head to extend the vocab with image tokens :563-565,844-846,914-920, and an
optional non-causal attention flag).

Architecture facts mirrored:
  * layer-wise scaling: per-layer query/KV head counts and FFN widths
    (qkv_multipliers / ffn_multipliers linearly interpolated, divisor-rounded)
  * GQA attention with per-head RMSNorm on q and k (normalize_qk_projections)
  * rotary embeddings on head_dim
  * SwiGLU FFN (ffn_with_glu)
  * shared input/output embedding (share_input_output_layers) with the
    extra-token table concatenated for the logits projection
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.models.rotary import apply_rope, rope_1d
from unidisc_tpu.ops.attention import multihead_attention


def make_divisible(v: float, divisor: int = 8) -> int:
    """(reference: models/configuration_openelm_local.py make_divisible)"""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@dataclass(frozen=True)
class ELMConfig:
    vocab_size: int = 32001          # text vocab (reference: LLaMA-2 + mask)
    extra_tokens: int = 16384        # image vocab extension
    model_dim: int = 1280
    num_layers: int = 16
    head_dim: int = 64
    num_gqa_groups: int = 4
    qkv_multipliers: Tuple[float, float] = (0.5, 1.0)
    ffn_multipliers: Tuple[float, float] = (0.5, 4.0)
    ffn_dim_divisor: int = 256
    max_length: int = 2048
    rope_freq: float = 10_000.0
    causal: bool = True              # reference optional full-attention flag
    # inference quantization: None | "int8" (W8A8 via ops/quant.py; convert
    # trained params with quantize_elm_params)
    quant: Optional[str] = None

    @property
    def total_vocab(self) -> int:
        return self.vocab_size + self.extra_tokens

    def layer_q_heads(self) -> Sequence[int]:
        mults = np.linspace(self.qkv_multipliers[0], self.qkv_multipliers[1],
                            self.num_layers)
        heads = []
        g = self.num_gqa_groups
        for m in mults:
            q = int(make_divisible(self.model_dim * m, self.head_dim)
                    // self.head_dim)
            heads.append(((q + g - 1) // g) * g)  # divisible by GQA groups
        return heads

    def layer_kv_heads(self) -> Sequence[int]:
        return [max(q // self.num_gqa_groups, 1)
                for q in self.layer_q_heads()]

    def layer_ffn_dims(self) -> Sequence[int]:
        mults = np.linspace(self.ffn_multipliers[0], self.ffn_multipliers[1],
                            self.num_layers)
        return [make_divisible(self.model_dim * m, self.ffn_dim_divisor)
                for m in mults]


# OpenELM released sizes (approximate reference HF configs)
ELM_PRESETS = {
    "270m": ELMConfig(model_dim=1280, num_layers=16, num_gqa_groups=4),
    "450m": ELMConfig(model_dim=1536, num_layers=20, num_gqa_groups=4),
    "1.1b": ELMConfig(model_dim=2048, num_layers=28, num_gqa_groups=4),
    "tiny": ELMConfig(vocab_size=40, extra_tokens=24, model_dim=64,
                      num_layers=3, head_dim=16, num_gqa_groups=2,
                      max_length=64),
}


class RMSNorm(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 ** 2, -1, keepdims=True) + 1e-6)
        return (y * w).astype(x.dtype)


def _dense(c: "ELMConfig", features: int, name: str,
           compute_dtype=jnp.bfloat16):
    """nn.Dense, or int8 W8A8 QDense when cfg.quant == 'int8' (the same
    inference quantization as the DIT — ops/quant.py; AR decode is
    weight-bandwidth-bound so int8 weights halve the per-step HBM read)."""
    if getattr(c, "quant", None) == "int8":
        from unidisc_tpu.models.dit import QDense
        return QDense(features, use_bias=False, out_dtype=compute_dtype,
                      name=name)
    return nn.Dense(features, use_bias=False, dtype=compute_dtype,
                    name=name)


class ELMAttention(nn.Module):
    cfg: ELMConfig
    layer_idx: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cos, sin, kv_cache=None, cache_index=None):
        c = self.cfg
        hd = c.head_dim
        qh = c.layer_q_heads()[self.layer_idx]
        kvh = c.layer_kv_heads()[self.layer_idx]
        b, l, _ = x.shape

        qkv = _dense(c, (qh + 2 * kvh) * hd, "qkv_proj",
                     self.compute_dtype)(x)
        q = qkv[..., :qh * hd].reshape(b, l, qh, hd)
        k = qkv[..., qh * hd:(qh + kvh) * hd].reshape(b, l, kvh, hd)
        v = qkv[..., (qh + kvh) * hd:].reshape(b, l, kvh, hd)

        # per-head RMS q/k norm (reference normalize_qk_projections)
        q = RMSNorm(hd, name="q_norm")(q)
        k = RMSNorm(hd, name="k_norm")(k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if kv_cache is not None:
            # scalar cache_index = lockstep decode; (B,) vector = per-row
            # positions (continuous batching); 4-tuple cache = int8 KV
            # (same design as models/dit.py Attention)
            vector_index = jnp.ndim(cache_index) == 1

            def write(cache, new):
                if vector_index:
                    return jax.vmap(
                        lambda cr, nr, p: jax.lax.dynamic_update_slice(
                            cr, nr.astype(cr.dtype), (p, 0, 0))
                    )(cache, new, cache_index)
                return jax.lax.dynamic_update_slice(
                    cache, new.astype(cache.dtype), (0, cache_index, 0, 0))

            int8_cache = len(kv_cache) == 4
            if int8_cache:
                from unidisc_tpu.ops.quant import quantize_kv
                k_q, k_s = quantize_kv(k)
                v_q, v_s = quantize_kv(v)
                ckq, cks, cvq, cvs = (write(cache, new) for cache, new in
                                      zip(kv_cache, (k_q, k_s, v_q, v_s)))
                new_cache = (ckq, cks, cvq, cvs)
                lk = ckq.shape[1]
            else:
                ck, cv = (write(cache, new) for cache, new in
                          zip(kv_cache, (k, v)))
                new_cache = (ck, cv)
                k, v = ck, cv
                lk = ck.shape[1]
            # causal within the new block (multi-token prefill exact)
            q_pos = jnp.arange(l)
            if vector_index:
                mask = (jnp.arange(lk)[None, None, :]
                        <= cache_index[:, None, None]
                        + q_pos[None, :, None])[:, None, :, :]
            else:
                mask = (jnp.arange(lk)[None, :]
                        <= cache_index + q_pos[:, None])[None, None, :, :]
            if int8_cache:
                from unidisc_tpu.ops.quant import int8_kv_attention
                rep = qh // kvh
                out = int8_kv_attention(
                    q, jnp.repeat(ckq, rep, axis=2),
                    jnp.repeat(cks, rep, axis=2),
                    jnp.repeat(cvq, rep, axis=2),
                    jnp.repeat(cvs, rep, axis=2), mask=mask)
                out = out.reshape(b, l, qh * hd)
                return _dense(c, c.model_dim, "out_proj",
                              self.compute_dtype)(out), new_cache
        else:
            mask = None

        # GQA: repeat kv heads to match q heads
        rep = qh // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        out = multihead_attention(
            q, k, v, mask=mask,
            causal=c.causal and kv_cache is None, backend="xla")
        out = out.reshape(b, l, qh * hd)
        return _dense(c, c.model_dim, "out_proj",
                      self.compute_dtype)(out), new_cache


class ELMBlock(nn.Module):
    cfg: ELMConfig
    layer_idx: int
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, cos, sin, kv_cache=None, cache_index=None):
        c = self.cfg
        h, new_cache = ELMAttention(c, self.layer_idx, self.compute_dtype,
                                    name="attn")(
            RMSNorm(c.model_dim, name="attn_norm")(x), cos, sin,
            kv_cache, cache_index)
        x = x + h
        ffn_dim = c.layer_ffn_dims()[self.layer_idx]
        y = RMSNorm(c.model_dim, name="ffn_norm")(x)
        # SwiGLU (reference ffn_with_glu)
        gate_up = _dense(c, 2 * ffn_dim, "proj_1", self.compute_dtype)(y)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        y = nn.silu(gate) * up
        y = _dense(c, c.model_dim, "proj_2", self.compute_dtype)(y)
        return x + y, new_cache


class OpenELM(nn.Module):
    """Causal LM over the extended text+image vocab.

    __call__(ids, kv_cache=None, cache_index=None) -> logits (fp32) or
    (logits, new_cache). kv_cache: list of per-layer (k, v) with layer-
    specific head counts.
    """

    cfg: ELMConfig
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ids, kv_cache=None, cache_index=None):
        c = self.cfg
        embed = self.param("token_embeddings", nn.initializers.normal(0.02),
                           (c.vocab_size, c.model_dim))
        embed_extra = self.param("token_embeddings_extra",
                                 nn.initializers.normal(0.02),
                                 (c.extra_tokens, c.model_dim))
        table = jnp.concatenate([embed, embed_extra], axis=0)
        x = jnp.take(table, ids, axis=0).astype(self.compute_dtype)

        cos_np, sin_np = rope_1d(c.max_length, c.head_dim, c.rope_freq)
        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)
        if kv_cache is not None and jnp.ndim(cache_index) == 1:
            # per-row decode positions (continuous batching)
            pos = jnp.clip(cache_index[:, None]
                           + jnp.arange(ids.shape[1])[None, :],
                           0, cos.shape[0] - 1)
            cos = jnp.take(cos, pos, axis=0)      # (B, l, d2)
            sin = jnp.take(sin, pos, axis=0)
        elif kv_cache is not None:
            cos = jax.lax.dynamic_slice_in_dim(cos, cache_index,
                                               ids.shape[1], axis=0)
            sin = jax.lax.dynamic_slice_in_dim(sin, cache_index,
                                               ids.shape[1], axis=0)
        else:
            cos = cos[:ids.shape[1]]
            sin = sin[:ids.shape[1]]

        new_caches = []
        for i in range(c.num_layers):
            layer_cache = None if kv_cache is None else kv_cache[i]
            x, nc = ELMBlock(c, i, self.compute_dtype,
                             name=f"layer_{i}")(x, cos, sin, layer_cache,
                                                cache_index)
            new_caches.append(nc)

        x = RMSNorm(c.model_dim, name="norm")(x)
        # shared input/output embedding incl. extra tokens (reference
        # share_input_output_layers + lm_extra concat)
        if getattr(c, "quant", None) == "int8":
            # int8 copy of the (transposed) shared table for the head;
            # lookups above stay fp (quantize_elm_params fills these)
            from unidisc_tpu.ops.quant import qdot
            v_total = c.vocab_size + c.extra_tokens
            head_q = self.param(
                "lm_head_q",
                lambda key, shape: jnp.zeros(shape, jnp.int8),
                (c.model_dim, v_total))
            head_scale = self.param("lm_head_scale",
                                    nn.initializers.ones, (v_total,))
            logits = qdot(x, head_q, head_scale,
                          out_dtype=jnp.float32)
        else:
            logits = jnp.einsum("bld,vd->blv", x.astype(jnp.float32),
                                table.astype(jnp.float32))
        if kv_cache is not None:
            return logits, new_caches
        return logits


def init_elm_cache(cfg: ELMConfig, batch: int, max_len: int,
                   dtype=jnp.bfloat16, quant: bool = False):
    """Per-layer (k, v) caches with layer-specific kv head counts.

    quant=True: per-layer int8 4-tuples (k_q, k_s, v_q, v_s) — see
    ops/quant.int8_kv_attention."""
    caches = []
    for kvh in cfg.layer_kv_heads():
        shape = (batch, max_len, kvh, cfg.head_dim)
        if quant:
            sshape = (batch, max_len, kvh, 1)
            caches.append((jnp.zeros(shape, jnp.int8),
                           jnp.ones(sshape, jnp.float32),
                           jnp.zeros(shape, jnp.int8),
                           jnp.ones(sshape, jnp.float32)))
        else:
            caches.append((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)))
    return caches


def init_elm(rng, cfg: ELMConfig, batch_size: int = 1):
    model = OpenELM(cfg)
    ids = jnp.zeros((batch_size, min(cfg.max_length, 8)), jnp.int32)
    params = model.init({"params": rng}, ids)["params"]
    return model, params
