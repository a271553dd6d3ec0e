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

The op is differentiable with FLASH BACKWARD kernels (FlashAttention-2
style): the forward saves only an LSE residual per query row; separate dKV
and dQ Pallas kernels recompute the attention weights tile-by-tile with
`di = sum(o*do)` precomputed once — the scores matrix is never
materialized in either direction. Measured on v5e @L2048/D128: fwd+bwd
1.5x faster than the XLA einsum path (55 vs 37 TF/s), grads match XLA to
bf16 grain (4e-3). Fully-masked query rows (padding / segment -1) are
defined to produce zero output and zero gradient.
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


def _fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref, lse_ref,
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
        m = m_scr[...][:, :1]
        # fully-masked query rows (padding / segment -1): the additive
        # MASK_VALUE leaves m ~ -1e30 — define their output and gradient
        # as zero (lse=0 makes backward p = exp(-1e30 - 0) = 0)
        valid = m > MASK_VALUE * 0.5
        l_inv = jnp.where(valid & (l > 0.0), 1.0 / jnp.maximum(l, 1e-30),
                          0.0)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = jnp.where(valid, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _small_fwd_kernel(q_ref, k_ref, v_ref, qseg_ref, kseg_ref, o_ref,
                      lse_ref, *, causal, scale, use_segs, need_lse):
    """Short-sequence kernel: ONE kv tile per q row block, ALL heads of the
    block batched into one program via batched dot_generals.

    Rationale (measured on v5e): at the production t2i shape
    (B16, H12, L384, D64) the tiled online-softmax kernel issues 192 tiny
    programs whose fixed per-program cost (~4us) dominates — 819us vs XLA's
    510us. Batching the 12 heads into one program per batch element and
    skipping the head_dim 64->128 padding amortizes that overhead; with a
    single kv tile the online-softmax state is unnecessary, so the scores
    stay in registers/VMEM for a direct softmax.
    """
    q = q_ref[0]                                    # (hb, L, d)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (hb, Lq, Lk) f32

    mask = None
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = cols <= rows
    if use_segs:
        qseg = qseg_ref[0][None, :, :1]             # (1, Lq, 1)
        kseg = kseg_ref[0][:1, None, :]             # (1, 1, Lk)
        seg_ok = (qseg == kseg) & (qseg >= 0)
        mask = seg_ok if mask is None else (mask & seg_ok)
    if mask is not None:
        s = s + jnp.where(mask, 0.0, MASK_VALUE)

    m = jnp.max(s, axis=-1, keepdims=True)          # (hb, Lq, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    valid = m > MASK_VALUE * 0.5
    l_inv = jnp.where(valid, 1.0 / jnp.maximum(l, 1e-30), 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)         # (hb, Lq, d)
    # normalize the small (hb, Lq, d) output, not the big (hb, Lq, Lk)
    # score matrix — saves a full VPU pass over the scores
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)
    if need_lse:
        lse = jnp.where(valid, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])
    else:
        # inference path: the (B,H,L,128) f32 residual is dead weight
        # (~38MB HBM writes at the t2i shape) — emit a token-sized block
        lse_ref[0] = jnp.zeros(lse_ref.shape[1:], lse_ref.dtype)


def _small_fwd(q, k, v, segment_ids, causal, scale, need_lse=True):
    """Head-batched single-kv-tile forward for L <= SMALL_MAX_L.
    q,k,v: (B, H, L, D) unpadded in D. Returns (out, lse (B,H,Lq_p,128))."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    lq_p = ((lq + 127) // 128) * 128
    lk_p = ((lk + 127) // 128) * 128
    qp = _pad_to(q, lq_p, 2)
    kp = _pad_to(k, lk_p, 2)
    vp = _pad_to(v, lk_p, 2)

    use_segs = segment_ids is not None or lk != lk_p
    if segment_ids is not None:
        qseg, kseg = segment_ids
    else:
        qseg = jnp.zeros((b, lq), jnp.int32)
        kseg = jnp.zeros((b, lk), jnp.int32)
    qseg = _pad_to(qseg, lq_p, 1, value=-1)
    kseg = _pad_to(kseg, lk_p, 1, value=-2)
    qseg_l = jnp.broadcast_to(qseg[:, :, None], (b, lq_p, 128))
    kseg_s = jnp.broadcast_to(kseg[:, None, :], (b, 8, lk_p))

    # head block: largest divisor of H whose fp32 score block fits ~6MB
    hb = h
    while hb > 1 and (hb * lq_p * lk_p * 4 > 6 * 1024 * 1024 or h % hb):
        hb -= 1
    while h % hb:
        hb -= 1
    nh = h // hb

    lse_rows = lq_p if need_lse else 8
    kernel = functools.partial(_small_fwd_kernel, causal=causal,
                               scale=scale, use_segs=use_segs,
                               need_lse=need_lse)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h, lq_p, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lse_rows, 128), jnp.float32)),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, hb, lq_p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, lk_p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, lk_p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, lq_p, 128), lambda bi, hi: (bi, 0, 0)),
            pl.BlockSpec((1, 8, lk_p), lambda bi, hi: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, hb, lq_p, d), lambda bi, hi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, hb, lse_rows, 128),
                         lambda bi, hi: (bi, hi, 0, 0)),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(qp, kp, vp, qseg_l, kseg_s)
    return out[:, :, :lq, :], lse


# single-kv-tile head-batched path applies below this sequence length
SMALL_MAX_L = 640


def pallas_auto_ok(head_dim: int, seq_len: int) -> bool:
    """Auto-policy: should the pallas kernel handle this shape?

    Measured IN-CONTEXT on v5e (full DIT forward, not isolated microbench —
    isolated attention chains mislead here: XLA overlaps the einsum
    attention's HBM traffic with the surrounding matmuls, while pallas_call
    is a fusion barrier and the (B,L,H,D)<->(B,H,L,D) transposes around the
    kernel cost real HBM passes):
      * L=384  D64  (115M t2i): XLA wins slightly (13.7 vs 14.6 ms/fwd)
      * L=384  D128 (1.4B t2i): parity (30.8 ms/fwd both)
      * L=1024 D64: tiled kernel wins 6% end-to-end (29.0 vs 30.8 ms/fwd)
      * L=4096 D128: tiled kernel 3.8x XLA on the attention itself
    The short-seq head-batched kernel (_small_fwd) keeps forced-pallas and
    packed-segment use at small L at parity instead of the old 0.62x loss.
    """
    return (head_dim % 64 == 0 and seq_len >= 768) or \
        (head_dim % 128 == 0 and seq_len >= 512)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _pick_block(length, cap):
    """Largest multiple of 128 <= cap that divides the 128-padded length —
    avoids whole-tile padding waste (e.g. L=1152 gets 384 tiles, not 1024
    tiles padded to 2048)."""
    l128 = ((length + 127) // 128) * 128
    for blk in range(min(cap, l128), 127, -128):
        if l128 % blk == 0:
            return blk, l128
    return 128, l128


def _prep(q, k, v, segment_ids):
    """Shared fwd/bwd padding + segment layout prep."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    block_q, lq_p = _pick_block(lq, BLOCK_Q)
    block_k, lk_p = _pick_block(lk, BLOCK_K)
    d_p = max(((d + 127) // 128) * 128, 128)

    qp = _pad_to(_pad_to(q, lq_p, 2), d_p, 3)
    kp = _pad_to(_pad_to(k, lk_p, 2), d_p, 3)
    vp = _pad_to(_pad_to(v, lk_p, 2), d_p, 3)

    use_segs = segment_ids is not None or lk != lk_p
    if segment_ids is not None:
        qseg, kseg = segment_ids
    else:
        qseg = jnp.zeros((b, lq), jnp.int32)
        kseg = jnp.zeros((b, lk), jnp.int32)
    # lane/sublane-friendly layouts (q segs broadcast over 128 lanes,
    # kv segs over 8 sublanes — mirrors the canonical JAX flash impl)
    qseg = _pad_to(qseg, lq_p, 1, value=-1)
    kseg = _pad_to(kseg, lk_p, 1, value=-2)
    qseg_l = jnp.broadcast_to(qseg[:, :, None], (b, lq_p, 128))
    kseg_s = jnp.broadcast_to(kseg[:, None, :], (b, 8, lk_p))
    return (qp, kp, vp, qseg, kseg, qseg_l, kseg_s, use_segs,
            block_q, block_k, lq_p, lk_p, d_p)


def _flash_fwd(q, k, v, segment_ids, causal, scale, need_lse=True):
    """q,k,v: (B, H, L, D) — runs the kernel on padded shapes.
    Returns (out (B,H,L,D), lse (B,H,Lq_p,128) residual)."""
    b, h, lq, d = q.shape
    if lq <= SMALL_MAX_L and k.shape[2] <= SMALL_MAX_L:
        return _small_fwd(q, k, v, segment_ids, causal, scale,
                          need_lse=need_lse)
    (qp, kp, vp, _, _, qseg, kseg, use_segs,
     block_q, block_k, lq_p, lk_p, d_p) = _prep(q, k, v, segment_ids)

    nq, nk = lq_p // block_q, lk_p // block_k
    grid = (b, h, nq, nk)

    kernel = functools.partial(_fwd_kernel, causal=causal, scale=scale,
                               use_segs=use_segs, nk=nk,
                               block_q=block_q, block_k=block_k)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h, lq_p, d_p), q.dtype),
                   jax.ShapeDtypeStruct((b, h, lq_p, 128), jnp.float32)),
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
        out_specs=(pl.BlockSpec((1, 1, block_q, d_p),
                                lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
                   pl.BlockSpec((1, 1, block_q, 128),
                                lambda bi, hi, qi, ki: (bi, hi, qi, 0))),
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
    return out[:, :, :lq, :d], lse


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
    if mask is not None:
        # fully-masked query rows produce zero output (matches the kernel)
        probs = jnp.where(mask.any(-1, keepdims=True), probs, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype),
                      v).astype(q.dtype)


# ---------------------------------------------------------------------------
# backward kernels (FlashAttention-2 style: LSE residual, di precompute;
# separate dKV and dQ kernels with their natural iteration orders —
# boom guide §7 / reference flash-attn backward)
# ---------------------------------------------------------------------------

def _masked_p(q, k, lse, qi, ki, block_q, block_k, causal, use_segs,
              qseg_ref, kseg_ref, scale):
    """Recompute normalized attention weights for one (q, kv) tile pair."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    mask = None
    if causal:
        mask = cols <= rows
    if use_segs:
        seg_ok = (qseg_ref[0][:, :1] == kseg_ref[0][:1, :]) & \
            (qseg_ref[0][:, :1] >= 0)
        mask = seg_ok if mask is None else (mask & seg_ok)
    if mask is not None:
        s = s + jnp.where(mask, 0.0, MASK_VALUE)
    return jnp.exp(s - lse), s


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                    qseg_ref, kseg_ref, dk_ref, dv_ref,
                    dk_scr, dv_scr, *, causal, scale, use_segs, nq,
                    block_q, block_k):
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]                      # (bq, 1)
        di = di_ref[0, 0][:, :1]                        # (bq, 1)
        p, _ = _masked_p(q, k, lse, qi, ki, block_q, block_k, causal,
                         use_segs, qseg_ref, kseg_ref, scale)
        # dV += P^T @ dO
        dv_scr[...] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO @ V^T ; dS = P * (dP - di) * scale
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di) * scale
        # dK += dS^T @ Q
        dk_scr[...] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if causal:
        # q tiles entirely above the diagonal contribute nothing
        pl.when((qi + 1) * block_q - 1 >= ki * block_k)(_run)
    else:
        _run()

    @pl.when(qi == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
                   qseg_ref, kseg_ref, dq_ref, dq_scr,
                   *, causal, scale, use_segs, nk, block_q, block_k):
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse = lse_ref[0, 0][:, :1]
        di = di_ref[0, 0][:, :1]
        p, _ = _masked_p(q, k, lse, qi, ki, block_q, block_k, causal,
                         use_segs, qseg_ref, kseg_ref, scale)
        dp = jax.lax.dot_general(do, v.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di) * scale
        dq_scr[...] += jax.lax.dot(ds, k.astype(jnp.float32),
                                   preferred_element_type=jnp.float32)

    if causal:
        pl.when((qi + 1) * block_q - 1 >= ki * block_k)(_run)
    else:
        _run()

    @pl.when(ki == nk - 1)
    def _finalize():
        dq_ref[0, 0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd(q, k, v, segment_ids, o, lse, g, causal, scale):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    (qp, kp, vp, _, _, qseg, kseg, use_segs,
     block_q, block_k, lq_p, lk_p, d_p) = _prep(q, k, v, segment_ids)
    dop = _pad_to(_pad_to(g, lq_p, 2), d_p, 3)
    nq, nk = lq_p // block_q, lk_p // block_k

    # di = sum(o * do) per query (precomputed once; broadcast over lanes)
    di = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)
    di = _pad_to(di, lq_p, 2)
    di = jnp.broadcast_to(di[..., None], (b, h, lq_p, 128))

    q_spec = pl.BlockSpec((1, 1, block_q, d_p),
                          lambda bi, hi, i, j: (bi, hi, j, 0))
    kv_spec_dkv = pl.BlockSpec((1, 1, block_k, d_p),
                               lambda bi, hi, i, j: (bi, hi, i, 0))
    row_spec = pl.BlockSpec((1, 1, block_q, 128),
                            lambda bi, hi, i, j: (bi, hi, j, 0))
    qseg_spec = pl.BlockSpec((1, block_q, 128),
                             lambda bi, hi, i, j: (bi, j, 0))
    kseg_spec_dkv = pl.BlockSpec((1, 8, block_k),
                                 lambda bi, hi, i, j: (bi, 0, i))

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, causal=causal, scale=scale, use_segs=use_segs,
        nq=nq, block_q=block_q, block_k=block_k)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        out_shape=(jax.ShapeDtypeStruct((b, h, lk_p, d_p), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, lk_p, d_p), jnp.float32)),
        grid=(b, h, nk, nq),
        in_specs=[q_spec, kv_spec_dkv, kv_spec_dkv, q_spec, row_spec,
                  row_spec, qseg_spec, kseg_spec_dkv],
        out_specs=(pl.BlockSpec((1, 1, block_k, d_p),
                                lambda bi, hi, i, j: (bi, hi, i, 0)),
                   pl.BlockSpec((1, 1, block_k, d_p),
                                lambda bi, hi, i, j: (bi, hi, i, 0))),
        scratch_shapes=[pltpu.VMEM((block_k, d_p), jnp.float32),
                        pltpu.VMEM((block_k, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse, di, qseg, kseg)

    q_spec_dq = pl.BlockSpec((1, 1, block_q, d_p),
                             lambda bi, hi, i, j: (bi, hi, i, 0))
    kv_spec_dq = pl.BlockSpec((1, 1, block_k, d_p),
                              lambda bi, hi, i, j: (bi, hi, j, 0))
    row_spec_dq = pl.BlockSpec((1, 1, block_q, 128),
                               lambda bi, hi, i, j: (bi, hi, i, 0))
    qseg_spec_dq = pl.BlockSpec((1, block_q, 128),
                                lambda bi, hi, i, j: (bi, i, 0))
    kseg_spec_dq = pl.BlockSpec((1, 8, block_k),
                                lambda bi, hi, i, j: (bi, 0, j))

    dq_kernel = functools.partial(
        _bwd_dq_kernel, causal=causal, scale=scale, use_segs=use_segs,
        nk=nk, block_q=block_q, block_k=block_k)
    dq = pl.pallas_call(
        dq_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, lq_p, d_p), jnp.float32),
        grid=(b, h, nq, nk),
        in_specs=[q_spec_dq, kv_spec_dq, kv_spec_dq, q_spec_dq, row_spec_dq,
                  row_spec_dq, qseg_spec_dq, kseg_spec_dq],
        out_specs=pl.BlockSpec((1, 1, block_q, d_p),
                               lambda bi, hi, i, j: (bi, hi, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d_p), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lse, di, qseg, kseg)

    return (dq[:, :, :lq, :d].astype(q.dtype),
            dk[:, :, :lk, :d].astype(k.dtype),
            dv[:, :, :lk, :d].astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash(q, k, v, segment_ids, causal, scale):
    # primal (no-grad) path: skip the LSE residual writes entirely
    out, _ = _flash_fwd(q, k, v, segment_ids, causal, scale, need_lse=False)
    return out


def _flash_vjp_fwd(q, k, v, segment_ids, causal, scale):
    out, lse = _flash_fwd(q, k, v, segment_ids, causal, scale)
    return out, (q, k, v, segment_ids, out, lse)


def _flash_vjp_bwd(causal, scale, res, g):
    q, k, v, segment_ids, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, segment_ids, o, lse, g, causal, scale)
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
