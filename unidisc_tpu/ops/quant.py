"""W8A8 int8 quantized matmuls for TPU inference.

v5e's MXU runs int8xint8->int32 at 2x the bf16 rate (394 vs 197 peak);
measured on-chip here: 1.7-1.8x over bf16 at the production shapes
(head 768x48385, qkv 768x2304, mlp 768x3072 — see BASELINE.md). The
sampler's forward is trunk-matmul-bound, so this is the headline lever the
attention kernels can't reach.

Scheme (standard dynamic W8A8):
  - weights: symmetric per-out-channel int8, quantized ONCE offline
    (quantize_per_channel / quantize_dit_params);
  - activations: symmetric per-token (row) int8, quantized on the fly
    inside the jitted program (dynamic_quantize) — one max-abs reduction
    per token, fused by XLA into the surrounding elementwise work;
  - dot in int8 with int32 accumulation, then a rank-1 rescale
    (row_scale x col_scale) applied to the int32 result.

No reference counterpart: the reference serves in bf16/fp16 (torch).
This is inference-only; training stays bf16-compute/fp32-params.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# 1.4B batch-knee mitigation experiment (BASELINE.md: XLA's int8 dot
# scheduling degrades 22%/row going M=3072 -> 6144 at K=2048-class trunk
# shapes). UNIDISC_QDOT_CHUNK_M=<rows> serializes trunk dots (N <= 8192;
# the 48k head IMPROVES with batch and is excluded) into M-chunks of that
# size via lax.map so each dot stays on the good schedule. 0 = off.
_CHUNK_M = int(os.environ.get("UNIDISC_QDOT_CHUNK_M", "0"))


def quantize_per_channel(w: jax.Array, axis: int = 0
                         ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-out-channel int8 weight quantization.

    `axis` is the CONTRACTING (fan-in) axis; scales are per output channel.
    Returns (w_q int8 same shape, scale f32 with axis reduced)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.round(w.astype(jnp.float32) /
                    jnp.expand_dims(scale, axis)).astype(jnp.int8)
    return w_q, scale


def dynamic_quantize(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row (last-dim) symmetric int8 activation quantization."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x_q = jnp.round(x.astype(jnp.float32) / scale).astype(jnp.int8)
    return x_q, scale.astype(jnp.float32)


def qdot(x: jax.Array, w_q: jax.Array, w_scale: jax.Array, *,
         bias: Optional[jax.Array] = None,
         out_dtype=jnp.bfloat16, backend: str = "xla") -> jax.Array:
    """y = x @ dequant(w_q) with int8 MXU math.

    x: (..., K) float; w_q: (K, N) int8; w_scale: (N,) f32.
    Accumulates int32 on the MXU, rescales by (x_row_scale * w_scale).
    backend: "xla" (default) or "pallas" — the Mosaic full-K-slab kernel
    with fused epilogue (ops/int8_matmul.py; flip per
    scripts/bench_int8_dot.py measurements on the target chip)."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    x_q, x_scale = dynamic_quantize(x2)
    if backend == "pallas":
        from unidisc_tpu.ops.int8_matmul import int8_matmul
        y = int8_matmul(x_q, x_scale, w_q, w_scale, bias=bias,
                        out_dtype=out_dtype)
        return y.reshape(*lead, w_q.shape[-1])
    n = w_q.shape[-1]
    m = x2.shape[0]

    def _dot(xq, xs):
        yk = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        yk = yk.astype(jnp.float32) * xs * w_scale[None, :]
        if bias is not None:
            yk = yk + bias.astype(jnp.float32)[None, :]
        return yk.astype(out_dtype)

    if _CHUNK_M and n <= 8192 and m > _CHUNK_M and m % _CHUNK_M == 0:
        y = jax.lax.map(lambda a: _dot(*a),
                        (x_q.reshape(-1, _CHUNK_M, k),
                         x_scale.reshape(-1, _CHUNK_M, 1)))
        return y.reshape(*lead, n)
    return _dot(x_q, x_scale).reshape(*lead, n)


# ---------------------------------------------------------------------------
# DIT parameter-tree conversion
# ---------------------------------------------------------------------------

def _quant_leaf(sub: dict, axis: int) -> dict:
    """{'kernel', ...} -> {'kernel_q', 'scale', ...} (bias passes through)."""
    sub = dict(sub)
    w_q, scale = quantize_per_channel(sub.pop("kernel"), axis=axis)
    sub["kernel_q"], sub["scale"] = w_q, scale
    return sub


def quantize_dit_params(params) -> dict:
    """fp32 DIT param tree -> the tree a quant="int8" DIT expects.

    Quantized: the trunk matmuls (attn_qkv, attn_out, mlp_0, mlp_2 —
    scan-stacked (n_blocks, K, N), per-layer per-out-channel) and the vocab
    head (output_layer/linear). adaLN modulation, timestep MLP, embeddings
    and norms are tiny and stay fp."""
    try:
        from flax.core import unfreeze
        params = unfreeze(params)
    except Exception:
        pass
    out = dict(params)
    blocks = dict(params["blocks"])
    attn = dict(blocks["attention"])
    for name in ("attn_qkv", "attn_out"):
        attn[name] = _quant_leaf(attn[name], axis=1)
    blocks["attention"] = attn
    for name in ("mlp_0", "mlp_2"):
        if name in blocks:  # absent under MoE (models/moe.py) — expert
            blocks[name] = _quant_leaf(blocks[name], axis=1)  # weights stay fp
    out["blocks"] = blocks
    head = dict(params["output_layer"])
    head["linear"] = _quant_leaf(head["linear"], axis=0)
    out["output_layer"] = head
    return out


def quantize_elm_params(params, cfg) -> dict:
    """fp32 OpenELM param tree -> the tree a quant="int8" ELM expects.

    Per-layer qkv/out/SwiGLU projections quantize per out-channel; the
    shared-embedding head becomes an int8 copy of the transposed table
    (lm_head_q (D, V) + per-vocab scales) while the fp tables stay for
    embedding lookups. cfg: models.elm.ELMConfig."""
    try:
        from flax.core import unfreeze
        params = unfreeze(params)
    except Exception:
        pass
    out = dict(params)
    for i in range(cfg.num_layers):
        layer = dict(params[f"layer_{i}"])
        attn = dict(layer["attn"])
        for name in ("qkv_proj", "out_proj"):
            attn[name] = _quant_leaf(attn[name], axis=0)
        layer["attn"] = attn
        for name in ("proj_1", "proj_2"):
            layer[name] = _quant_leaf(layer[name], axis=0)
        out[f"layer_{i}"] = layer
    table = jnp.concatenate([params["token_embeddings"],
                             params["token_embeddings_extra"]], axis=0)
    head_q, head_scale = quantize_per_channel(table.T, axis=0)
    out["lm_head_q"], out["lm_head_scale"] = head_q, head_scale
    return out


# ---------------------------------------------------------------------------
# int8 KV cache (AR decode)
# ---------------------------------------------------------------------------

def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, position, head) symmetric int8 over the head_dim axis.

    x: (..., D) float -> (int8 same shape, f32 scale (..., 1)). Used for
    both K/V cache writes and the dynamic q/p quantization inside
    int8_kv_attention."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)
    return jnp.round(x32 * (1.0 / s)).astype(jnp.int8), s


def int8_kv_attention(q: jax.Array, kq: jax.Array, ks: jax.Array,
                      vq: jax.Array, vs: jax.Array, *,
                      mask=None, softmax_scale=None) -> jax.Array:
    """Attention over an int8 KV cache without ever dequantizing it.

    The cache reads dominate large-batch AR decode (B16/L1024 @115M:
    ~600MB of bf16 K/V per token); int8 halves them. Instead of a bf16
    dequant pass (which XLA would materialize to HBM), both dots run on
    int8 directly:

      scores = (q8 @ k8^T) * q_s * k_s * scale   (int8 MXU, rank-1 rescale)
      out    = (p8 @ v8)   * p_s                 (v_s folded into p first)

    q: (B, l, H, D) float; kq/vq: (B, L, H, D) int8;
    ks/vs: (B, L, H, 1) f32. mask broadcastable to (B, H, l, L); True =
    attend. Returns (B, l, H, D) in q.dtype."""
    b, l, h, d = q.shape
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    q_q, q_s = quantize_kv(q)
    # (B, l, H, D) x (B, L, H, D) -> (B, H, l, L), int32 accumulation
    acc = jax.lax.dot_general(
        q_q, kq, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.int32)
    scores = (acc.astype(jnp.float32)
              * jnp.transpose(q_s, (0, 2, 1, 3))          # (B, H, l, 1)
              * jnp.transpose(ks, (0, 2, 3, 1))           # (B, H, 1, L)
              * scale)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)                   # (B, H, l, L)
    # fold per-position V scales into the weights, then quantize the
    # weight rows so the value contraction is an int8 MXU dot too
    pv = p * jnp.transpose(vs, (0, 2, 3, 1))              # (B, H, l, L)
    p_q, p_s = quantize_kv(pv)
    # (B, H, l, L) x (B, L, H, D): contract L, batch (B, H) -> (B, H, l, D)
    acc_v = jax.lax.dot_general(
        p_q, vq, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.int32)
    out = acc_v.astype(jnp.float32) * p_s                 # (B, H, l, D)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def quantize_model(config, params):
    """One-call int8 conversion for a DIT: returns (config, model, params)
    with model.quant='int8', a fresh DIT built from that config, and the
    converted tree. The single place the quantize-swap lives (bench.py,
    generate CLI, serving all call this)."""
    import dataclasses

    from unidisc_tpu.models.dit import DIT

    qm = dataclasses.replace(config.model, quant="int8")
    return (dataclasses.replace(config, model=qm), DIT(qm),
            quantize_dit_params(params))
