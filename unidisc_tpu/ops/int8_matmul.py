"""Hand-scheduled int8 W8A8 matmul (Mosaic) with fused rescale epilogue.

Round-2 measurement (BASELINE.md) found XLA's int8 dot outscheduling a
hand-tiled Mosaic dot 205 vs 136 TOPS at the 115M qkv shape — that
attempt accumulated through an int32/f32 HBM output (56 MB at
(6144, 2304), write-bound) and split K. This kernel addresses both:

  - FULL-K tiles: at trunk shapes (K <= 4096) a whole (bm, K) x (K, bn)
    slab fits VMEM, so each output tile is ONE int8 MXU contraction —
    no K-loop revisits, no partial-sum traffic;
  - the dequantize epilogue (acc * s_row * w_scale_col + bias) runs
    in-kernel on the int32 accumulator and writes bf16 ONCE — the
    int32 intermediate never touches HBM (the XLA chain materializes
    it when the epilogue doesn't fuse);
  - grid (N/bn, M/bm) with M innermost: the (K, bn) weight slab stays
    resident across the M sweep (Mosaic skips re-fetching blocks whose
    index map ignores the inner grid axis), so weights are read once —
    the decode-relevant regime (M small, weights dominate traffic).

`int8_matmul` is numerically exact vs the XLA reference (integer dot,
identical f32 epilogue). Production wiring: ops/quant.py routes matmuls
here when config.model.quant_backend == "pallas" (default remains XLA;
flip after `scripts/bench_int8_dot.py` shows a win on the target chip).

No reference counterpart (the reference serves bf16/fp16 torch).
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


def _pick(total: int, target: int, unit: int) -> int:
    best = 0
    b = unit
    while b <= min(total, target):
        if total % b == 0:
            best = b
        b += unit
    return best


def _kernel(xq_ref, s_ref, wq_ref, ws_ref, b_ref, o_ref, *, has_bias,
            out_dtype):
    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s_ref[...] * \
        ws_ref[...].astype(jnp.float32)
    if has_bias:
        out = out + b_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(out_dtype)


def int8_matmul(x_q: jax.Array, s: jax.Array, w_q: jax.Array,
                w_scale: jax.Array, *, bias: Optional[jax.Array] = None,
                out_dtype=jnp.bfloat16,
                block_m: int = 1024, block_n: int = 512) -> jax.Array:
    """(x_q int8 (M, K), s f32 (M, 1)) @ (w_q int8 (K, N), w_scale (N,))
    -> out_dtype (M, N), epilogue fused.

    Falls back to the XLA chain when the shape doesn't tile (M % 128,
    N % 128, K % 128 != 0 or the slab exceeds VMEM budget).
    """
    m, k = x_q.shape
    n = w_q.shape[1]
    has_bias = bias is not None

    bm = _pick(m, block_m, 128)
    bn = _pick(n, block_n, 128)
    # VMEM budget: double-buffered int8 slabs + f32 epilogue working set
    while bm and bn and (
            2 * (bm * k + k * bn) + bm * bn * 6) > 12 * 2 ** 20:
        if bm >= bn and _pick(m, bm // 2, 128):
            bm = _pick(m, bm // 2, 128)
        elif _pick(n, bn // 2, 128):
            bn = _pick(n, bn // 2, 128)
        else:
            bm = 0
    if not bm or not bn or k % 128 != 0:
        acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * s * \
            w_scale.astype(jnp.float32)[None, :]
        if has_bias:
            out = out + bias.astype(jnp.float32)[None, :]
        return out.astype(out_dtype)

    ws2 = w_scale.reshape(1, n).astype(jnp.float32)
    b2 = (bias.reshape(1, n) if has_bias
          else jnp.zeros((1, n), jnp.float32))

    kernel = functools.partial(_kernel, has_bias=has_bias,
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        # N outer / M inner: the weight slab (index map ignores i) stays
        # resident across the M sweep
        grid=(n // bn, m // bm),
        in_specs=[
            pl.BlockSpec((bm, k), lambda j, i: (i, 0)),    # x_q
            pl.BlockSpec((bm, 1), lambda j, i: (i, 0)),    # s
            pl.BlockSpec((k, bn), lambda j, i: (0, j)),    # w_q
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),    # w_scale
            pl.BlockSpec((1, bn), lambda j, i: (0, j)),    # bias
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(x_q, s, w_q, ws2, b2)


def xla_reference(x_q, s, w_q, w_scale, bias=None, out_dtype=jnp.bfloat16):
    """Oracle: identical math through XLA ops."""
    acc = jax.lax.dot_general(x_q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s * w_scale.astype(jnp.float32)[None, :]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :]
    return out.astype(out_dtype)
