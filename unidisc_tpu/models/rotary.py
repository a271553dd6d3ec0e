"""Rotary position embeddings: 1D tables + Lumina-style 2D axial tables for
image blocks, and the non-interleaved (GPT-NeoX half-rotation) application.

Redesigned from the reference's flash-attn rotary + diffusers
``get_2d_rotary_pos_embed_lumina`` (reference: models/dit.py:307-367,
models/dit.py:1046-1061, models/standalone_rotary.py:14-31). Tables are
precomputed host-side as plain arrays (no caching modules) and closed over by
the jitted forward.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_1d(length: int, head_dim: int, base: float = 10_000.0) -> Tuple[np.ndarray, np.ndarray]:
    """1D rotary tables, shape (length, head_dim//2) each.

    Matches reference Rotary (models/dit.py:307-330): inv_freq over
    arange(0, dim, 2)/dim; cos/sin of outer(t, inv_freq).
    """
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    t = np.arange(length, dtype=np.float64)
    freqs = np.outer(t, inv_freq)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def rope_2d_lumina(seq_len_2d: int, head_dim: int, linear_factor: float = 1.0,
                   base: float = 10_000.0, ntk_factor: float = 1.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Lumina-style axial 2D rotary tables for a square image token grid.

    Matches diffusers' get_2d_rotary_pos_embed_lumina as used in
    reference models/dit.py:1046-1061: half the frequency slots rotate by the
    row index, half by the column index, interleaved (h0,w0,h1,w1,...).
    Returns (seq_len_2d, head_dim//2) cos/sin tables.
    """
    side = int(math.isqrt(seq_len_2d))
    assert side * side == seq_len_2d, f"seq_len_2d must be square, got {seq_len_2d}"
    assert head_dim % 4 == 0
    theta = base * ntk_factor
    quarter = head_dim // 4
    # diffusers get_1d_rotary_pos_embed with dim = head_dim//2:
    # freqs = 1/(theta^(arange(0, dim, 2)/dim)) / linear_factor -> head_dim//4 slots
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim // 2, 2, dtype=np.float64)
                                / (head_dim // 2))) / linear_factor
    pos = np.arange(side, dtype=np.float64)
    ang = np.outer(pos, inv_freq)  # (side, quarter)
    angles = np.zeros((side, side, head_dim // 2), dtype=np.float64)
    angles[..., 0::2] = ang[:, None, :]   # h-axis frequencies (even slots)
    angles[..., 1::2] = ang[None, :, :]   # w-axis frequencies (odd slots)
    angles = angles.reshape(seq_len_2d, head_dim // 2)
    return np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)


def build_multires_rope(txt_length: int, img_lengths: Tuple[int, ...],
                        head_dim: int, base: float = 10_000.0,
                        linear_factor=None):
    """Combined rope table for interleaved variable-resolution batches
    (reference per-resolution buffers 256/1024/2304/4096,
    models/dit.py:1203-1232).

    Layout: rows [0:txt_length] = 1D table; then one 2D Lumina block per
    grid in `img_lengths`. Returns (cos, sin, offsets) where offsets maps
    img_length -> row offset of its 2D block; the packing collate adds the
    offset to each image token's raster index.

    linear_factor: per-resolution frequency stretch. Default None =
    grid_side/16, matching the reference's hardcoded per-resolution
    factors ((256,1),(1024,2),(2304,3),(4096,4) — models/dit.py:1213).
    A float applies uniformly.
    """
    cos1, sin1 = rope_1d(txt_length, head_dim, base)
    cos_parts, sin_parts = [cos1], [sin1]
    offsets = {}
    off = txt_length
    for n in img_lengths:
        lf = (linear_factor if linear_factor is not None
              else max(math.isqrt(n) / 16.0, 1.0))
        c2, s2 = rope_2d_lumina(n, head_dim, lf, base)
        offsets[n] = off
        cos_parts.append(c2)
        sin_parts.append(s2)
        off += n
    return (np.concatenate(cos_parts, 0), np.concatenate(sin_parts, 0),
            offsets)


def build_multimodal_rope(txt_length: int, img_length: int, head_dim: int,
                          rope_2d: bool, base: float = 10_000.0,
                          linear_factor: float = 1.0) -> Tuple[np.ndarray, np.ndarray]:
    """Fixed [txt | img] layout tables (reference: models/dit.py:1203-1240).

    Text positions get 1D RoPE over the full sequence index; image positions
    get 2D Lumina RoPE over their grid when rope_2d, else they continue the
    1D table.
    """
    total = txt_length + img_length
    cos1, sin1 = rope_1d(total, head_dim, base)
    if not rope_2d:
        return cos1, sin1
    cos2, sin2 = rope_2d_lumina(img_length, head_dim, linear_factor, base)
    cos = np.concatenate([cos1[:txt_length], cos2], axis=0)
    sin = np.concatenate([sin1[:txt_length], sin2], axis=0)
    return cos, sin


@partial(jax.jit, static_argnames=())
def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding, non-interleaved (GPT-NeoX) convention.

    Args:
      x: (..., L, H, D) query or key.
      cos/sin: (L, D//2) or (B, L, D//2).

    out[..., :d] = x1*cos - x2*sin ; out[..., d:2d] = x2*cos + x1*sin
    (reference: models/standalone_rotary.py:14-31).
    """
    d2 = cos.shape[-1]
    ro = 2 * d2
    # broadcast tables over the heads axis
    if cos.ndim == 2:
        c = cos[:, None, :]
        s = sin[:, None, :]
    else:  # (B, L, d2) -> (B, L, 1, d2)
        c = cos[:, :, None, :]
        s = sin[:, :, None, :]
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    x1 = x[..., :d2]
    x2 = x[..., d2:ro]
    out = jnp.concatenate(
        [x1 * c - x2 * s, x2 * c + x1 * s, x[..., ro:]], axis=-1)
    return out
