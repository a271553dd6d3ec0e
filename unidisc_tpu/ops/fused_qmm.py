"""Fused prologue + int8 W8A8 matmul Pallas kernel.

The int8 trunk (ops/quant.py, 1.38x end-to-end) still pays one VPU/HBM
round-trip per elementwise stage between matmuls: norm -> (HBM) ->
modulate -> (HBM) -> quantize -> (HBM) -> matmul. XLA fuses some of it but
the per-row max-abs reduction inside dynamic quantization forces the int8
activations to materialize before the dot. Per the step decomposition
(BASELINE.md: trunk 87% of the 115M sampling step, attention only ~16% of
trunk) these residual passes are the last throughput lever.

This kernel computes, in ONE pass over VMEM tiles:

    y = prologue(x)            # layernorm/rms [+ adaLN modulate], or
                               # tanh-gelu, or identity
    s, y_q = dynamic_int8(y)   # per-row symmetric scale
    out = (y_q @ w_q) * s * w_scale [+ bias]

Grid is (M/bm, N/bn) with N innermost; the normalized+quantized activation
tile is computed once per M tile (at j == 0) into VMEM scratch and reused
for every N tile, so the prologue VPU work isn't repeated and the int8
activations never touch HBM.

adaLN conditioning (shift/scale) is PER BATCH ROW broadcast over the
sequence (reference modulate: models/dit.py:263-268); the kernel takes it
as (B, K) and maps each M tile to its batch row, which requires the tile
not to straddle batch boundaries (L % bm == 0 — guaranteed by the
divisor-aware block pick). Modality gating (text rows bypass modulation)
rides in as an (M, 1) column.

No reference counterpart (the reference serves bf16/fp16 torch); the
quantization scheme matches ops/quant.py exactly, and `fused_qmm` with
interpret mode is bit-compatible with the XLA reference `_xla_reference`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _pick_block(total: int, target: int, unit: int = 128) -> int:
    """Largest multiple of `unit` dividing `total`, capped at `target`."""
    best = unit
    b = unit
    while b <= min(total, target):
        if total % b == 0:
            best = b
        b += unit
    return best


def _prologue(x, mode, norm_type, norm_w, shift, scale, mod):
    """The fused elementwise stage, fp32 in/out. Shared by the kernel and
    the XLA reference so the two paths are the same math."""
    if mode == "adaln_norm":
        if norm_type == "layernorm":
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        elif norm_type == "rms":
            y = x * jax.lax.rsqrt(
                jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-6)
        else:
            raise ValueError(norm_type)
        y = y * norm_w
        if shift is not None:
            # modality-gated adaLN (text rows pass through): with
            # m in {0,1}: y*(1+scale*m) + shift*m
            y = y * (1.0 + scale * mod) + shift * mod
        return y
    if mode == "gelu":
        # tanh-approx gelu, matching nn.gelu(approximate=True)
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))
    return x


def _quantize(y):
    amax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    # amax * (1/127) rather than amax / 127: XLA folds the division into a
    # reciprocal-multiply in some contexts but not others (pallas interpret
    # vs jitted graph), which would make kernel and oracle differ by 1 ulp
    # in s and flip borderline round()s
    s = jnp.where(amax > 0, amax * (1.0 / 127.0), 1.0)
    return jnp.round(y * (1.0 / s)), s


def _kernel(x_ref, nw_ref, sh_ref, sc_ref, mod_ref, yq_ref, s_ref, *,
            mode, norm_type, has_cond):
    """Prologue + dynamic int8 quantization, one HBM pass: reads the bf16
    activations once, writes int8 + per-row scales. The matmul itself is
    left to XLA — measured on v5e, the XLA int8 dot schedule (205 TOPS at
    the 115M qkv shape) beats a hand-tiled Mosaic dot (136 TOPS), while
    XLA's *elementwise* chain costs ~3 extra HBM round-trips (separate
    mean/var reduction, modulate materialization, amax reduction) that
    this kernel collapses."""
    x = x_ref[...].astype(jnp.float32)                    # (bm, K)
    nw = nw_ref[...].astype(jnp.float32) if mode == "adaln_norm" else None
    sh = sc = md = None
    if has_cond:
        sh = sh_ref[0].astype(jnp.float32)                # (1, K)
        sc = sc_ref[0].astype(jnp.float32)
        md = mod_ref[...].astype(jnp.float32)             # (bm, 1)
    y = _prologue(x, mode, norm_type, nw, sh, sc, md)
    y_q, s = _quantize(y)
    yq_ref[...] = y_q.astype(jnp.int8)
    s_ref[...] = s


def _xla_reference(x, w_q, w_scale, bias, mode, norm_type, norm_w, shift,
                   scale, modality, out_dtype):
    """Same math, XLA ops — fallback for untileable shapes and the test
    oracle (keep in sync with _kernel)."""
    y = _prologue(x.astype(jnp.float32), mode, norm_type,
                  None if norm_w is None else norm_w.astype(jnp.float32),
                  None if shift is None else shift.astype(jnp.float32),
                  None if scale is None else scale.astype(jnp.float32),
                  None if modality is None else
                  modality.astype(jnp.float32))
    y_q, s = _quantize(y)
    acc = jax.lax.dot_general(y_q.astype(jnp.int8), w_q,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)


def fused_qmm(x: jax.Array, w_q: jax.Array, w_scale: jax.Array, *,
              bias: Optional[jax.Array] = None,
              mode: str = "none",
              norm_type: str = "layernorm",
              norm_w: Optional[jax.Array] = None,
              shift: Optional[jax.Array] = None,
              scale: Optional[jax.Array] = None,
              modality: Optional[jax.Array] = None,
              rows_per_batch: Optional[int] = None,
              out_dtype=jnp.bfloat16,
              block_m: int = 512, block_n: int = 512) -> jax.Array:
    """prologue -> dynamic int8 (Pallas, one HBM pass) -> XLA int8 matmul.

    Args:
      x: (M, K) activations (any float dtype).
      w_q: (K, N) int8 weights; w_scale: (N,) f32 per-out-channel scales.
      bias: optional (N,).
      mode: "adaln_norm" (norm [+ modulate]) | "gelu" | "none".
      norm_w: (K,) norm weight (adaln_norm mode).
      shift/scale: optional (B, K) adaLN conditioning, one row per batch
        element; rows_per_batch = M // B maps x rows to batch rows.
      modality: optional (M,) 0/1 — rows with 0 skip modulation
        (reference modulate_with_mask, models/dit.py:263-268). Required
        semantics: None means modulate every row.
    Falls back to XLA (same math) when shapes don't tile.
    """
    m_rows, k = x.shape
    n = w_q.shape[1]
    has_cond = shift is not None
    if has_cond and modality is None:
        modality = jnp.ones((m_rows,), jnp.float32)

    if has_cond:
        # tiles must not straddle batch rows: pick bm dividing the
        # per-batch row count (which itself must divide M)
        tileable = (rows_per_batch is not None
                    and rows_per_batch % 128 == 0
                    and m_rows % rows_per_batch == 0)
        bm = _pick_block(rows_per_batch, block_m) if tileable else 128
    else:
        bm = _pick_block(m_rows, block_m)
        tileable = m_rows % 128 == 0
    # VMEM: double-buffered bf16 in + int8/scale out + fp32 working set
    while bm > 128 and bm * k * (2 * 2 + 1 + 4) > 10 * 2 ** 20:
        half = bm // 2
        if half % 128 != 0 or (m_rows % half != 0) or \
                (has_cond and rows_per_batch % half != 0):
            break
        bm = half
    tileable &= (m_rows % bm == 0 and k % 128 == 0
                 and bm * k * (2 * 2 + 1 + 4) <= 14 * 2 ** 20)
    if not tileable:
        return _xla_reference(x, w_q, w_scale, bias, mode, norm_type,
                              norm_w, shift, scale, modality, out_dtype)

    if has_cond:
        # bm divides rows_per_batch (checked above), so each tile sits
        # inside one batch row: batch index = (i*bm) // rows_per_batch
        cond_index = lambda i: (i * bm // rows_per_batch, 0, 0)
    else:
        cond_index = lambda i: (0, 0, 0)

    # placeholder arrays for unused operands keep the pallas_call signature
    # static (Mosaic requires all refs present)
    nw2 = (norm_w.reshape(1, k) if norm_w is not None
           else jnp.zeros((1, k), jnp.float32))
    # cond arrays carry a singleton middle axis so Mosaic's block-shape
    # rule holds (last two block dims must equal the array dims here)
    sh2 = (shift.reshape(-1, 1, k) if has_cond
           else jnp.zeros((1, 1, k), jnp.float32))
    sc2 = (scale.reshape(-1, 1, k) if has_cond
           else jnp.zeros((1, 1, k), jnp.float32))
    md2 = (modality.reshape(m_rows, 1).astype(jnp.float32) if has_cond
           else jnp.zeros((m_rows, 1), jnp.float32))

    kernel = functools.partial(_kernel, mode=mode, norm_type=norm_type,
                               has_cond=has_cond)
    x_q, s = pl.pallas_call(
        kernel,
        grid=(m_rows // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),          # x
            pl.BlockSpec((1, k), lambda i: (0, 0)),           # norm_w
            pl.BlockSpec((1, 1, k), cond_index),              # shift
            pl.BlockSpec((1, 1, k), cond_index),              # scale
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),          # modality
        ],
        out_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                   pl.BlockSpec((bm, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((m_rows, k), jnp.int8),
                   jax.ShapeDtypeStruct((m_rows, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x, nw2, sh2, sc2, md2)

    # the matmul + rank-1 rescale epilogue stay in XLA (it schedules the
    # int8 MXU dot better than a hand-tiled Mosaic loop: 205 vs 136 TOPS
    # measured at the 115M qkv shape)
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)
