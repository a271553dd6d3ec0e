"""Ring attention: exact sequence-parallel attention over a mesh axis.

Context parallelism for sequences too long for one chip's HBM: the
sequence dimension is sharded over a mesh axis (conventionally 'seq');
each device keeps its local Q chunk resident while K/V chunks rotate
around the ring with `ppermute`, and every device folds each incoming
block into a flash-style online-softmax accumulator (running max m,
normalizer l, unnormalized output acc). The result is EXACT attention —
memory per device is O(L/n) with n ring steps of ICI traffic, each
overlappable with the block compute.

Public recipe: Liu et al. 2023 "Ring Attention with Blockwise
Transformers" (PAPERS.md); collectives layout follows the scaling-book
ppermute pattern. No reference counterpart — the reference caps context
at one GPU's attention (models/dit.py:516-887); this is the TPU-native
scale-out for the >8k-token regime (SURVEY §5-6 long-context machinery).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MASK_VALUE = -1e30


def _block(q, k, v, scale, mask):
    """One flash block: returns (m, l, o) with o unnormalized.

    q: (B, Lq, H, D); k/v: (B, Lk, H, D); mask broadcastable to
    (B, H, Lq, Lk) or None."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if mask is not None:
        s = jnp.where(mask, s, MASK_VALUE)
    m = jnp.max(s, axis=-1)                            # (B, H, Lq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)                            # (B, H, Lq)
    o = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return m, l, o


def ring_attention(q, k, v, segment_ids=None, *, axis_name: str = "seq",
                   causal: bool = False,
                   softmax_scale: Optional[float] = None,
                   kv_segment_ids=None):
    """Per-shard ring attention body (call INSIDE shard_map / pjit with
    manual axes). q/k/v: the LOCAL sequence chunk (B, Lc, H, D); returns
    the local output chunk (B, Lc, H, D) in q.dtype.

    segment_ids: optional (B, Lc) per-token group ids (packed interleaved
    batches — ops/pallas_attention semantics): tokens attend only within
    their own segment; the local ids rotate around the ring with K/V.
    kv_segment_ids: optional distinct ids for the K/V side (defaults to
    segment_ids) — a query whose id matches no key anywhere in the ring
    gets exactly zero output (the repo's fully-masked-row contract).

    Requires the global sequence length to divide the axis size evenly
    (static shapes — enforced by the caller's sharding)."""
    if segment_ids is None and kv_segment_ids is not None:
        raise ValueError("kv_segment_ids requires segment_ids (the "
                         "query-side ids) — without them the key mask "
                         "would be silently dropped")
    b, lc, h, d = q.shape
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = softmax_scale if softmax_scale is not None else d ** -0.5

    q_pos = idx * lc + jnp.arange(lc)                  # global q positions

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(carry, r):
        k_cur, v_cur, seg_cur, m, l, acc, anyv = carry
        # after r receives we hold the chunk originally on device idx - r
        src = (idx - r) % n

        def attend(args):
            k_cur, v_cur, seg_cur, m, l, acc, anyv = args
            mask = None
            if causal:
                k_pos = src * lc + jnp.arange(lc)
                mask = (k_pos[None, :]
                        <= q_pos[:, None])[None, None, :, :]
            if segment_ids is not None:
                seg_ok = (segment_ids[:, :, None]
                          == seg_cur[:, None, :])[:, None, :, :]
                mask = seg_ok if mask is None else (mask & seg_ok)
            bm, bl, bo = _block(q, k_cur, v_cur, scale, mask)
            # per-row any-valid-key flag: with finite MASK_VALUE a fully-
            # masked row still accumulates l=Lk (p=exp(0)), so l>0 cannot
            # detect it — track validity explicitly to honor the repo's
            # fully-masked-row == zero-output kernel contract
            if mask is None:
                bv = jnp.ones_like(bm, bool)
            else:
                bv = jnp.broadcast_to(jnp.any(mask, axis=-1), bm.shape)
            m_new = jnp.maximum(m, bm)
            c1 = jnp.exp(m - m_new)
            c2 = jnp.exp(bm - m_new)
            return (m_new, l * c1 + bl * c2,
                    acc * c1[..., None] + bo * c2[..., None],
                    anyv | bv)

        if causal:
            # chunks entirely above the diagonal contribute nothing —
            # skip their FLOPs (each device decides locally; shard_map
            # runs per-device code so a device-varying cond is fine)
            m, l, acc, anyv = jax.lax.cond(
                src <= idx, attend, lambda args: args[3:],
                (k_cur, v_cur, seg_cur, m, l, acc, anyv))
        else:
            m, l, acc, anyv = attend(
                (k_cur, v_cur, seg_cur, m, l, acc, anyv))
        # rotate K/V (and their segment ids) to the next device (last
        # rotation is redundant but keeps the scan body uniform)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_nxt = jax.lax.ppermute(seg_cur, axis_name, perm)
        return (k_nxt, v_nxt, seg_nxt, m, l, acc, anyv), None

    # freshly-created initials are device-invariant under shard_map's
    # varying-axes typing; mark them varying over the ring axis so the
    # scan carry types line up
    from unidisc_tpu.parallel.compat import vary as _compat_vary
    _vary = lambda x: _compat_vary(x, axis_name)
    m0 = _vary(jnp.full((b, h, lc), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros((b, h, lc), jnp.float32))
    acc0 = _vary(jnp.zeros((b, h, lc, d), jnp.float32))
    anyv0 = _vary(jnp.zeros((b, h, lc), bool))
    kv_ids = kv_segment_ids if kv_segment_ids is not None else segment_ids
    seg0 = (kv_ids if kv_ids is not None
            else _vary(jnp.zeros((b, lc), jnp.int32)))
    (_, _, _, m, l, acc, anyv), _ = jax.lax.scan(
        body, (k, v, seg0, m0, l0, acc0, anyv0), jnp.arange(n))
    # rows with no valid key anywhere in the ring (padding segments) are
    # defined to be zero — keyed off the accumulated validity flag, not l
    # (finite MASK_VALUE means fully-masked rows still accumulate l=Lk)
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.where(anyv[..., None], out, 0.0)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh: Mesh, segment_ids=None, *,
                           seq_axis: str = "seq", causal: bool = False,
                           softmax_scale: Optional[float] = None,
                           kv_segment_ids=None):
    """Jit-level entry: q/k/v are GLOBAL (B, L, H, D) arrays; the L axis
    is sharded over `seq_axis` and attention runs as a ring. L must be
    divisible by the axis size. segment_ids: optional global (B, L);
    kv_segment_ids: optional distinct K/V-side ids (see ring_attention)."""
    n = mesh.shape[seq_axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"sequence {q.shape[1]} not divisible by "
                         f"{seq_axis} axis size {n}")
    if segment_ids is None and kv_segment_ids is not None:
        raise ValueError("kv_segment_ids requires segment_ids (the "
                         "query-side ids)")
    spec = P(None, seq_axis, None, None)
    fn = functools.partial(ring_attention, axis_name=seq_axis,
                           causal=causal, softmax_scale=softmax_scale)
    if segment_ids is None:
        return jax.shard_map(
            lambda q, k, v: fn(q, k, v), mesh=mesh,
            in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)
    seg_spec = P(None, seq_axis)
    if kv_segment_ids is None:
        return jax.shard_map(fn, mesh=mesh,
                             in_specs=(spec, spec, spec, seg_spec),
                             out_specs=spec)(q, k, v, segment_ids)
    return jax.shard_map(
        lambda q, k, v, s, ks: fn(q, k, v, s, kv_segment_ids=ks),
        mesh=mesh, in_specs=(spec, spec, spec, seg_spec, seg_spec),
        out_specs=spec)(q, k, v, segment_ids, kv_segment_ids)


# ---------------------------------------------------------------------------
# Flash-kernel ring (round-3 VERDICT #6): the XLA `_block` above
# materializes fp32 (B, H, Lc, Lc) score tiles per ring step — exact and
# fine at test scale, but at the >8k-token lengths the ring exists for
# this is the same score-spill regime root-caused at B32 (BASELINE.md).
# This variant runs each ring block through the Pallas flash kernel
# (ops/pallas_attention) and merges blocks by their logsumexp residuals:
#
#   lse_new = logaddexp(lse_run, lse_blk)
#   out_new = out_run * e^(lse_run-lse_new) + out_blk * e^(lse_blk-lse_new)
#
# Forward memory per ring step is O(Lc) residuals instead of O(Lc^2)
# scores. Backward (training) re-runs the exact XLA ring under jax.vjp —
# same math, score-materializing regime — via a custom_vjp, so gradients
# stay available without a flash-lse backward rule.
# ---------------------------------------------------------------------------


def _flash_block(q, k, v, qseg, kseg, scale, causal,
                 kv_distinct: bool = False):
    """(B, Lc, H, D) tensors -> (out (B,H,Lq,D) fp32 normalized,
    lse (B,H,Lq) fp32 with -inf on fully-masked rows). kv_distinct
    marks that kseg may DIFFER from qseg (explicit kv_segment_ids), so
    diagonal validity can't assume row r sees itself."""
    from unidisc_tpu.ops.pallas_attention import _flash_fwd
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    segs = (qseg, kseg) if qseg is not None else None
    out, lse = _flash_fwd(qt, kt, vt, segs, causal, scale, need_lse=True)
    lse = lse[:, :, : qt.shape[2], 0]
    if qseg is not None:
        # the kernel writes lse=0 on fully-masked rows (its own zero
        # sentinel); for cross-block merging those must weigh NOTHING.
        # The any-valid-key flag is computed WITHOUT materializing the
        # full (B, Lq, Lk) mask (that quadratic tile is exactly what
        # the flash ring exists to avoid at 8k+):
        if causal and not kv_distinct:
            # diagonal ring block with SHARED ids (kseg is qseg): row r
            # always sees itself, so validity is just non-pad
            valid = qseg >= 0
        elif causal:
            # distinct kv ids: row r is valid iff SOME key j <= r in
            # this block shares its id — computed in row chunks so the
            # boolean tile stays O(C * Lc), not O(Lc^2)
            lc = qseg.shape[1]
            C = min(lc, 512)
            while lc % C:
                C //= 2
            kpos = jnp.arange(lc)

            def row_chunk(c):
                qs = jax.lax.dynamic_slice_in_dim(qseg, c * C, C, 1)
                r = c * C + jnp.arange(C)
                eq = (qs[:, :, None] == kseg[:, None, :]) \
                    & (kpos[None, None, :] <= r[None, :, None])
                return eq.any(-1)                      # (B, C)

            chunks = jax.lax.map(row_chunk, jnp.arange(lc // C))
            valid = jnp.transpose(chunks, (1, 0, 2)).reshape(
                qseg.shape) & (qseg >= 0)
        else:
            # membership of qseg[row] in the block's key segments via a
            # per-row sorted search: O(Lc log Lc) time, O(Lc) memory
            ks = jnp.sort(kseg, axis=1)
            pos = jax.vmap(jnp.searchsorted)(ks, qseg)
            found = jnp.take_along_axis(
                ks, jnp.clip(pos, 0, ks.shape[1] - 1), 1) == qseg
            valid = found & (qseg >= 0)
        lse = jnp.where(valid[:, None, :], lse, -jnp.inf)
    return out.astype(jnp.float32), lse


def _merge(lse_run, out_run, lse_b, out_b):
    lse_new = jnp.logaddexp(lse_run, lse_b)
    dead = jnp.isneginf(lse_new)
    w_old = jnp.where(dead, 0.0, jnp.exp(lse_run - lse_new))
    w_new = jnp.where(dead, 0.0, jnp.exp(lse_b - lse_new))
    return lse_new, out_run * w_old[..., None] + out_b * w_new[..., None]


def _ring_flash_impl(q, k, v, qseg, kvseg, axis_name, causal, scale):
    b, lc, h, d = q.shape
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    kv0 = kvseg if kvseg is not None else qseg
    # r=0 is the diagonal block: local causal masking applies here (and
    # only here — earlier chunks are fully visible, later ones skipped)
    out, lse = _flash_block(q, k, v, qseg, kv0, scale, causal,
                            kv_distinct=kvseg is not None)

    from unidisc_tpu.parallel.compat import vary as _compat_vary
    _vary = lambda x: _compat_vary(x, axis_name)

    seg0 = kv0 if kv0 is not None else _vary(
        jnp.zeros((b, lc), jnp.int32))

    def body(carry, r):
        k_cur, v_cur, seg_cur, lse, out = carry
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        seg_cur = jax.lax.ppermute(seg_cur, axis_name, perm)
        src = (idx - r) % n

        def attend(args):
            k_cur, v_cur, seg_cur, lse, out = args
            ob, lb = _flash_block(q, k_cur, v_cur, qseg,
                                  seg_cur if qseg is not None else None,
                                  scale, causal=False)
            lse, out = _merge(lse, out, lb, ob)
            return lse, out

        if causal:
            lse, out = jax.lax.cond(
                src <= idx, attend, lambda a: a[3:],
                (k_cur, v_cur, seg_cur, lse, out))
        else:
            lse, out = attend((k_cur, v_cur, seg_cur, lse, out))
        return (k_cur, v_cur, seg_cur, lse, out), None

    if n > 1:
        (_, _, _, lse, out), _ = jax.lax.scan(
            body, (k, v, seg0, lse, out), jnp.arange(1, n))
    # rows masked in every block: lse == -inf and out == 0 already
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ring_flash(q, k, v, qseg, kvseg, axis_name, causal, scale):
    return _ring_flash_impl(q, k, v, qseg, kvseg, axis_name, causal, scale)


def _ring_flash_fwd(q, k, v, qseg, kvseg, axis_name, causal, scale):
    out = _ring_flash_impl(q, k, v, qseg, kvseg, axis_name, causal, scale)
    return out, (q, k, v, qseg, kvseg)


def _ring_flash_bwd(axis_name, causal, scale, res, g):
    q, k, v, qseg, kvseg = res
    if qseg is not None:
        # the flash FORWARD defines pad rows (id < 0) as exactly zero,
        # while the XLA ring used for the VJP lets pads attend pads —
        # zero their cotangent so the backward is consistent with the
        # forward that actually ran (their dq is then 0 and they
        # contribute nothing to dk/dv)
        g = g * (qseg >= 0)[:, :, None, None].astype(g.dtype)

    def f(q, k, v):
        return ring_attention(q, k, v, qseg, axis_name=axis_name,
                              causal=causal, softmax_scale=scale,
                              kv_segment_ids=kvseg)
    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as _np

    def _f0(x):
        return None if x is None else _np.zeros(x.shape,
                                                dtype=jax.dtypes.float0)
    return dq, dk, dv, _f0(qseg), _f0(kvseg)


_ring_flash.defvjp(_ring_flash_fwd, _ring_flash_bwd)


def ring_attention_flash(q, k, v, segment_ids=None, *,
                         axis_name: str = "seq", causal: bool = False,
                         softmax_scale: Optional[float] = None,
                         kv_segment_ids=None):
    """Per-shard flash-kernel ring (same contract as ring_attention,
    with ONE divergence: pad queries/keys carry the Pallas kernel's
    semantics — segment id < 0 rows are fully masked and return zero,
    instead of pads-attend-pads). Backward runs the XLA ring's VJP."""
    d = q.shape[-1]
    scale = softmax_scale if softmax_scale is not None else d ** -0.5
    return _ring_flash(q, k, v, segment_ids, kv_segment_ids,
                       axis_name, causal, scale)
