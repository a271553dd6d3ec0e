"""Multi-head attention for TPU.

Two backends behind one functional interface:
  * "xla": jnp einsum + fp32 softmax — XLA fuses this into an efficient
    flash-like schedule on TPU and it is the reference implementation for
    kernel equivalence tests.
  * "pallas": fused flash-attention Pallas kernel (ops/pallas_attention.py),
    used on real TPU for the hot path.

Replaces the reference's attention-kernel mux (flash-attn 2/3, SDPA/cuDNN,
FlexAttention, torch_xla pallas; reference: models/dit.py:516-887) with a
TPU-first design: static shapes, additive bias masks (sample-id block masks
are materialized as bias, or pushed into the Pallas kernel as block masks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _chunk_limit_bytes() -> int:
    """Score-spill chunk threshold (bytes); UNIDISC_ATTN_CHUNK_MB
    overrides (0 = never chunk). Read per call so tests/benches can
    sweep it — jit caches by traced value anyway."""
    import os
    mb = os.environ.get("UNIDISC_ATTN_CHUNK_MB")
    if mb is None:
        return 96 * 1024 * 1024
    v = int(mb)
    return (1 << 62) if v == 0 else v * 1024 * 1024


def make_sample_ids_mask(sample_ids: jax.Array) -> jax.Array:
    """Build a (B, L, L) boolean attention mask from per-token sample ids.

    Tokens attend only within their own packed sample; ids < 0 are padding and
    attend to nothing (reference: model_utils.py:740-770 _interleaved_attn_mask
    / get_interleaved_block_mask built for FlexAttention).
    """
    same = sample_ids[:, :, None] == sample_ids[:, None, :]
    valid = (sample_ids >= 0)[:, :, None] & (sample_ids >= 0)[:, None, :]
    return same & valid


def make_causal_mask(length: int) -> jax.Array:
    return jnp.tril(jnp.ones((length, length), dtype=bool))


def multihead_attention(q: jax.Array,
                        k: jax.Array,
                        v: jax.Array,
                        *,
                        mask: Optional[jax.Array] = None,
                        causal: bool = False,
                        backend: str = "xla",
                        softmax_scale: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention.

    Args:
      q: (B, Lq, H, D); k, v: (B, Lk, H, D).
      mask: optional boolean mask broadcastable to (B, H, Lq, Lk) or
        (B, Lq, Lk); True = attend.
      causal: apply causal masking (AR mode).
      backend: "xla" | "pallas".

    Returns (B, Lq, H, D) in q.dtype.
    """
    if backend == "pallas":
        from unidisc_tpu.ops.pallas_attention import flash_attention
        return flash_attention(q, k, v, mask=mask, causal=causal,
                               softmax_scale=softmax_scale)

    b, lq, h, d = q.shape

    # Batch chunking: above ~128MB of fp32 scores XLA's fusion planner
    # stops keeping the (B,H,Lq,Lk) scores in VMEM tiles and spills them
    # to HBM fp32, tripling per-token attention cost (measured on v5e at
    # the t2i shape: 20 -> 69 us/tok going from CFG-16 to CFG-64; the B32
    # batch anti-scaling of BASELINE.md). Running the same einsum over
    # batch chunks keeps every chunk on the fused strategy.
    score_bytes = b * h * lq * k.shape[1] * 4
    # swept on v5e at 115M: 64-96MB best, 256MB bad; override for
    # per-chip tuning (UNIDISC_ATTN_CHUNK_MB=0 disables chunking)
    _CHUNK_LIMIT = _chunk_limit_bytes()
    if score_bytes > _CHUNK_LIMIT and mask is None and b > 1:
        per = b * h * lq * k.shape[1] * 4 // b
        chunk = max(1, _CHUNK_LIMIT // per)
        while b % chunk:
            chunk -= 1
        if chunk < b:
            qs = q.reshape(b // chunk, chunk, lq, h, d)
            ks = k.reshape(b // chunk, chunk, *k.shape[1:])
            vs = v.reshape(b // chunk, chunk, *v.shape[1:])
            out = jax.lax.map(
                lambda qkv: multihead_attention(
                    qkv[0], qkv[1], qkv[2], causal=causal, backend="xla",
                    softmax_scale=softmax_scale),
                (qs, ks, vs))
            return out.reshape(b, lq, h, d)
    lk = k.shape[1]
    scale = softmax_scale if softmax_scale is not None else 1.0 / (d ** 0.5)

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale

    if causal:
        cmask = make_causal_mask(lq) if lq == lk else (
            jnp.arange(lk)[None, :] <= (jnp.arange(lq)[:, None] + (lk - lq)))
        logits = jnp.where(cmask[None, None], logits, -jnp.inf)
    if mask is not None:
        if mask.ndim == 3:
            mask = mask[:, None]
        logits = jnp.where(mask, logits, -jnp.inf)

    probs = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows (padding queries) produce NaNs; zero them
    if mask is not None:
        probs = jnp.nan_to_num(probs)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out.astype(q.dtype)
