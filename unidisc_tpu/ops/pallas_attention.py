"""Fused flash-attention Pallas kernel for TPU.

The hot-path attention kernel replacing the reference's external-kernel mux
(flash-attn 2/3 CUDA, SDPA, FlexAttention, torch_xla pallas flash-attn;
reference: models/dit.py:516-887, block masks model_utils.py:740-770).

Design (per the Pallas TPU playbook):
  * grid (B, H, num_q_tiles, num_kv_tiles); kv dim is the innermost,
    sequential ("arbitrary") dimension carrying the online-softmax state
  * fp32 running statistics (m, l, acc) in VMEM scratch, persisted across
    kv tiles of one q tile
  * per-element masking: causal and/or segment ids (packed multi-sample
    batches attend only within their own `sample_ids` group)
  * causal tile-skip: kv tiles entirely above the diagonal are skipped
  * mask additive value -1e30 (not -inf: exp(-inf - -inf) => NaN)
  * inputs padded to (128, 128) tile multiples; head_dim padded to 128

The op is differentiable: a custom_vjp recomputes attention with the XLA
einsum path in the backward (flash backward kernels can replace this later
without touching call sites).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 1024  # default q tile (tuned on v5e: 35 TF/s vs XLA 24 @L1024)
BLOCK_K = 1024  # default kv tile
MASK_VALUE = -1e30


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
                m_scr, l_scr, acc_scr, *, causal, scale, use_segs, nk,
                block_q, block_k):
    ki = pl.program_id(3)
    qi = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _run():
        # keep q/k in their storage dtype (bf16) for the MXU matmul —
        # fp32 accumulate via preferred_element_type; upcasting first
        # would halve MXU throughput
        q = q_ref[0, 0]                                # (bq, d)
        k = k_ref[0, 0]                                # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk) f32

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        mask = None
        if causal:
            mask = cols <= rows
        if use_segs:
            qseg = qseg_ref[0][:, :1]                   # (bq, 1)
            kseg = kseg_ref[0][:1, :]                   # (1, bk)
            seg_ok = (qseg == kseg) & (qseg >= 0)
            mask = seg_ok if mask is None else (mask & seg_ok)
        if mask is not None:
            s = s + jnp.where(mask, 0.0, MASK_VALUE)

        m_prev = m_scr[...]                             # (bq, 128)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)     # (bq, 1)
        m_next = jnp.maximum(m_prev, m_curr)            # broadcast (bq, 128)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])  # (bq, 1)
        p = jnp.exp(s - m_next[:, :1])                  # (bq, bk)
        l_corr = alpha * l_prev[:, :1]
        l_next = jnp.sum(p, axis=-1, keepdims=True) + l_corr

        m_scr[...] = jnp.broadcast_to(m_next[:, :1], m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

        v = v_ref[0, 0]                                 # (bk, d) bf16
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    if causal:
        # skip kv tiles fully above the diagonal
        pl.when((qi + 1) * block_q - 1 >= ki * block_k)(_run)
    else:
        _run()

    @pl.when(ki == nk - 1)
    def _finalize():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _flash_fwd(q, k, v, segment_ids, causal, scale):
    """q,k,v: (B, H, L, D) — runs the kernel on padded shapes."""
    b, h, lq, d = q.shape
    lk = k.shape[2]

    def pick_block(length, cap):
        """Largest multiple of 128 <= cap that divides the 128-padded
        length — avoids whole-tile padding waste (e.g. L=1152 gets 384
        tiles, not 1024 tiles padded to 2048)."""
        l128 = ((length + 127) // 128) * 128
        for blk in range(min(cap, l128), 127, -128):
            if l128 % blk == 0:
                return blk, l128
        return 128, l128

    block_q, lq_p = pick_block(lq, BLOCK_Q)
    block_k, lk_p = pick_block(lk, BLOCK_K)
    d_p = max(((d + 127) // 128) * 128, 128)

    qp = _pad_to(_pad_to(q, lq_p, 2), d_p, 3)
    kp = _pad_to(_pad_to(k, lk_p, 2), d_p, 3)
    vp = _pad_to(_pad_to(v, lk_p, 2), d_p, 3)

    use_segs = segment_ids is not None or lk != lk_p
    if segment_ids is not None:
        qseg, kseg = segment_ids
    else:
        # padding-only segmentation: real tokens get seg 0, padding -1
        qseg = jnp.zeros((b, lq), jnp.int32)
        kseg = jnp.zeros((b, lk), jnp.int32)
    # lane/sublane-friendly layouts (q segs broadcast over 128 lanes,
    # kv segs over 8 sublanes — mirrors the canonical JAX flash impl)
    qseg = _pad_to(qseg, lq_p, 1, value=-1)
    kseg = _pad_to(kseg, lk_p, 1, value=-2)
    qseg = jnp.broadcast_to(qseg[:, :, None], (b, lq_p, 128))
    kseg = jnp.broadcast_to(kseg[:, None, :], (b, 8, lk_p))

    nq, nk = lq_p // block_q, lk_p // block_k
    grid = (b, h, nq, nk)

    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               use_segs=use_segs, nk=nk,
                               block_q=block_q, block_k=block_k)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d_p),
                         lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, block_q, 128),
                         lambda bi, hi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, 8, block_k),
                         lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d_p), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, qseg, kseg)
    return out[:, :, :lq, :d]


def _xla_reference(q, k, v, segment_ids, causal, scale):
    """XLA einsum attention with identical masking semantics (used for the
    backward pass and as the equivalence oracle)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    lq, lk = q.shape[2], k.shape[2]
    mask = None
    if causal:
        mask = (jnp.arange(lk)[None, :] <= jnp.arange(lq)[:, None])[
            None, None]
    if segment_ids is not None:
        qseg, kseg = segment_ids
        seg = (qseg[:, :, None] == kseg[:, None, :]) & \
            (qseg >= 0)[:, :, None]
        seg = seg[:, None]
        mask = seg if mask is None else (mask & seg)
    if mask is not None:
        logits = jnp.where(mask, logits, MASK_VALUE)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype),
                      v).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, segment_ids, causal, scale):
    return _flash_fwd(q, k, v, segment_ids, causal, scale)


def _flash_vjp_fwd(q, k, v, segment_ids, causal, scale):
    return _flash_fwd(q, k, v, segment_ids, causal, scale), \
        (q, k, v, segment_ids)


def _flash_vjp_bwd(causal, scale, res, g):
    q, k, v, segment_ids = res
    _, vjp = jax.vjp(
        lambda q, k, v: _xla_reference(q, k, v, segment_ids, causal, scale),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    mask: Optional[jax.Array] = None,
                    segment_ids: Optional[tuple] = None,
                    causal: bool = False,
                    softmax_scale: Optional[float] = None) -> jax.Array:
    """Flash attention with (B, L, H, D) layout (matching ops.attention).

    Args:
      q, k, v: (B, L, H, D).
      mask: unsupported here — use `segment_ids` (the structured form) or
        the "xla" backend for arbitrary masks.
      segment_ids: optional (q_seg (B, Lq), k_seg (B, Lk)) int32; attention
        allowed only within equal non-negative segments (packed batches,
        reference FlexAttention block masks model_utils.py:740-770).
      causal: causal masking (AR mode).
    """
    if mask is not None:
        raise NotImplementedError(
            "pallas backend takes structured masks via segment_ids; "
            "use backend='xla' for arbitrary masks")
    scale = softmax_scale if softmax_scale is not None \
        else 1.0 / (q.shape[-1] ** 0.5)
    # (B, L, H, D) -> (B, H, L, D)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _flash(qt, kt, vt, segment_ids, causal, scale)
    return jnp.transpose(out, (0, 2, 1, 3))
