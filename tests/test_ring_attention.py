"""Ring attention (sequence parallelism) tests on the 8-device CPU mesh:
the ring must reproduce single-device attention exactly (it's exact
math, not an approximation), forward and backward, causal and full."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unidisc_tpu.ops.attention import multihead_attention
from unidisc_tpu.parallel.ring_attention import ring_attention_sharded

B, L, H, D = 2, 64, 4, 16


def seq_mesh(n=8):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs.reshape(n), ("seq",))


def _inputs(seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_single_device(causal):
    mesh = seq_mesh()
    q, k, v = _inputs()
    ref = multihead_attention(q, k, v, causal=causal, backend="xla")
    out = jax.jit(lambda q, k, v: ring_attention_sharded(
        q, k, v, mesh, causal=causal))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_gradients_match(seed=1):
    """Differentiability: sequence-parallel training needs grads through
    the ppermute ring."""
    mesh = seq_mesh(4)
    q, k, v = _inputs(seed)

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mesh, causal=True)
        return jnp.sum(o * jnp.cos(jnp.arange(D)))

    def loss_ref(q, k, v):
        o = multihead_attention(q, k, v, causal=True, backend="xla")
        return jnp.sum(o * jnp.cos(jnp.arange(D)))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")


def test_ring_sharded_inputs_stay_sharded():
    """With inputs actually placed on the seq sharding, the output keeps
    the same layout (no hidden all-gather of the sequence axis)."""
    mesh = seq_mesh()
    q, k, v = _inputs(2)
    sh = NamedSharding(mesh, P(None, "seq", None, None))
    q, k, v = (jax.device_put(a, sh) for a in (q, k, v))
    out = jax.jit(lambda q, k, v: ring_attention_sharded(
        q, k, v, mesh, causal=False))(q, k, v)
    assert out.sharding.spec == P(None, "seq", None, None)
    ref = multihead_attention(
        np.asarray(q), np.asarray(k), np.asarray(v), backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_indivisible_sequence_rejected():
    mesh = seq_mesh()
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, 60, H, D), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention_sharded(q, q, q, mesh)


def test_ring_segment_ids_match_dense_mask():
    """Packed-batch semantics: tokens attend only within their own
    segment; the rotating segment ids must reproduce the dense
    sample-ids mask exactly."""
    from unidisc_tpu.ops.attention import make_sample_ids_mask

    mesh = seq_mesh()
    q, k, v = _inputs(3)
    rng = np.random.RandomState(5)
    # contiguous segments of random lengths per row (packing layout)
    seg = np.zeros((B, L), np.int32)
    for b in range(B):
        cuts = np.sort(rng.choice(np.arange(8, L - 8), 3, replace=False))
        seg[b] = np.searchsorted(cuts, np.arange(L), side="right")
    seg = jnp.asarray(seg)

    ref = multihead_attention(q, k, v,
                              mask=make_sample_ids_mask(seg),
                              backend="xla")
    out = jax.jit(lambda q, k, v, s: ring_attention_sharded(
        q, k, v, mesh, s, causal=False))(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_seq_parallel_interleaved_train_forward():
    """A DIT forward with sample_ids under the sequence-parallel context
    (ring + rotating segment ids) matches the plain forward."""
    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.parallel.seq_parallel import sequence_parallel

    devs = np.asarray(jax.devices()[:4])
    from jax.sharding import Mesh
    mesh = Mesh(devs.reshape(1, 1, 1, 4),
                ("dcn", "fsdp", "tensor", "seq"))
    cfg = Config.make("tiny").override(**{
        "model.dropout": 0.0, "model.time_conditioning": True})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, m.vocab_size, (2, m.length)))
    modality = jnp.asarray(rng.randint(0, 2, (2, m.length)))
    sample_ids = jnp.asarray(
        np.repeat(np.arange(4), m.length // 4)[None].repeat(2, 0))
    sigma = jnp.full((2,), 0.3)

    ref = model.apply({"params": params}, x, sigma, modality=modality,
                      sample_ids=sample_ids)
    with sequence_parallel(mesh):
        out = jax.jit(lambda p, x, s, mod, sid: model.apply(
            {"params": p}, x, s, modality=mod, sample_ids=sid))(
                params, x, sigma, modality, sample_ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_ring_segment_gradients_match():
    """Grads through the segment-masked ring match the dense-mask
    reference (packed long-context training is differentiable)."""
    from unidisc_tpu.ops.attention import make_sample_ids_mask

    mesh = seq_mesh(4)
    q, k, v = _inputs(7)
    seg = jnp.asarray(np.repeat(np.arange(4), L // 4)[None].repeat(B, 0))

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mesh, seg)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = multihead_attention(q, k, v, mask=make_sample_ids_mask(seg),
                                backend="xla")
        return jnp.sum(jnp.sin(o))

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")


def test_fully_masked_rows_produce_zero_output():
    """Queries whose segment id matches NO key anywhere in the ring must
    return exactly zero (the repo's fully-masked-row kernel contract).
    With finite MASK_VALUE the softmax normalizer still accumulates
    (p=exp(0) per key), so an l>0 check cannot detect this — it needs
    the explicit any-valid-key flag (ADVICE r2 finding). Reachable via
    distinct kv_segment_ids (pad queries vs real keys)."""
    mesh = seq_mesh(4)
    q, k, v = _inputs(9)
    seg_q = np.repeat(np.arange(4), L // 4)[None].repeat(B, 0).astype(np.int32)
    seg_kv = seg_q.copy()
    # queries [0, 16) of batch 0 get an id no key carries -> empty rows
    seg_q[0, :16] = 99

    out = jax.jit(lambda q, k, v, s, ks: ring_attention_sharded(
        q, k, v, mesh, s, causal=False, kv_segment_ids=ks))(
            q, k, v, jnp.asarray(seg_q), jnp.asarray(seg_kv))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0, :16], 0.0)

    # the untouched rows still match the dense-mask oracle
    from unidisc_tpu.ops.attention import make_sample_ids_mask
    ref = multihead_attention(q, k, v,
                              mask=make_sample_ids_mask(jnp.asarray(seg_kv)),
                              backend="xla")
    np.testing.assert_allclose(out[0, 16:], np.asarray(ref)[0, 16:],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(out[1], np.asarray(ref)[1],
                               atol=2e-5, rtol=2e-5)


# -- flash-kernel ring (round-3: Pallas blocks + lse merging) --------------


def test_flash_ring_matches_xla_ring():
    """The Pallas-block ring (lse-residual merging) must reproduce the
    XLA ring exactly — causal and full — at CPU-interpret scale."""
    from unidisc_tpu.parallel.ring_attention import ring_attention_flash

    mesh = seq_mesh(4)
    q, k, v = _inputs(11)
    spec = P(None, "seq", None, None)
    for causal in (False, True):
        ref = multihead_attention(q, k, v, causal=causal, backend="xla")
        out = jax.jit(jax.shard_map(
            lambda q, k, v: ring_attention_flash(q, k, v, causal=causal),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"causal={causal}")


def test_flash_ring_segments_and_masked_rows():
    """Segment isolation matches the dense mask; queries whose id matches
    no key return exactly zero (kernel pad semantics)."""
    from unidisc_tpu.ops.attention import make_sample_ids_mask
    from unidisc_tpu.parallel.ring_attention import ring_attention_flash

    mesh = seq_mesh(4)
    q, k, v = _inputs(12)
    seg_kv = np.repeat(np.arange(4), L // 4)[None].repeat(B, 0).astype(
        np.int32)
    seg_q = seg_kv.copy()
    seg_q[0, :16] = 99  # matches no key -> zero rows

    spec = P(None, "seq", None, None)
    sspec = P(None, "seq")
    out = jax.jit(jax.shard_map(
        lambda q, k, v, s, ks: ring_attention_flash(
            q, k, v, s, kv_segment_ids=ks),
        mesh=mesh, in_specs=(spec,) * 3 + (sspec, sspec),
        out_specs=spec, check_vma=False))(
            q, k, v, jnp.asarray(seg_q), jnp.asarray(seg_kv))
    out = np.asarray(out)
    np.testing.assert_array_equal(out[0, :16], 0.0)
    ref = multihead_attention(
        q, k, v, mask=make_sample_ids_mask(jnp.asarray(seg_kv)),
        backend="xla")
    np.testing.assert_allclose(out[0, 16:], np.asarray(ref)[0, 16:],
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(out[1], np.asarray(ref)[1],
                               atol=2e-5, rtol=2e-5)


def test_flash_ring_gradients_match_xla_ring():
    """custom_vjp: backward re-runs the XLA ring's VJP — grads must match
    the plain ring (and therefore single-device attention)."""
    from unidisc_tpu.parallel.ring_attention import ring_attention_flash

    mesh = seq_mesh(4)
    q, k, v = _inputs(13)
    spec = P(None, "seq", None, None)

    def make_loss(fn):
        def loss(q, k, v):
            o = jax.shard_map(
                lambda q, k, v: fn(q, k, v, causal=True),
                mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                check_vma=False)(q, k, v)
            return jnp.sum(jnp.sin(o))
        return loss

    g_flash = jax.jit(jax.grad(make_loss(ring_attention_flash),
                               argnums=(0, 1, 2)))(q, k, v)

    def loss_ref(q, k, v):
        o = multihead_attention(q, k, v, causal=True, backend="xla")
        return jnp.sum(jnp.sin(o))
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")


def test_flash_ring_causal_distinct_kv_masked_diagonal():
    """Regression (r3 review finding 1): under causal + DISTINCT
    kv_segment_ids, a query row whose id matches no visible key — even
    on its own diagonal block — must return exactly zero. The old
    shortcut (valid = qseg >= 0) merged the kernel's lse=0 sentinel as
    a real weight-1 zero contribution and silently down-scaled the
    row's true output. Oracle: the XLA ring (explicit any-valid-key
    accounting)."""
    from unidisc_tpu.parallel.ring_attention import ring_attention_flash

    mesh = seq_mesh(4)
    q, k, v = _inputs(21)
    seg_kv = np.repeat(np.arange(4), L // 4)[None].repeat(B, 0).astype(
        np.int32)
    seg_q = seg_kv.copy()
    # rows [0, 8) of batch 0: id 77 exists in the KEYS only at position
    # 60 (causally invisible to them) -> fully masked despite the id
    # existing somewhere in the ring
    seg_q[0, :8] = 77
    seg_kv[0, 60] = 77

    spec = P(None, "seq", None, None)
    sspec = P(None, "seq")

    def run(fn):
        return np.asarray(jax.jit(jax.shard_map(
            lambda q, k, v, s, ks: fn(q, k, v, s, causal=True,
                                      kv_segment_ids=ks),
            mesh=mesh, in_specs=(spec,) * 3 + (sspec, sspec),
            out_specs=spec, check_vma=False))(
                q, k, v, jnp.asarray(seg_q), jnp.asarray(seg_kv)))

    from unidisc_tpu.parallel.ring_attention import ring_attention
    out_flash = run(ring_attention_flash)
    out_xla = run(ring_attention)
    np.testing.assert_array_equal(out_flash[0, :8], 0.0)
    np.testing.assert_allclose(out_flash, out_xla, atol=2e-5, rtol=2e-5)


def test_kv_ids_without_q_ids_rejected():
    """Regression (r3 review finding 3): kv_segment_ids without
    segment_ids must raise instead of silently dropping the key mask."""
    from unidisc_tpu.parallel.ring_attention import ring_attention

    mesh = seq_mesh(4)
    q, k, v = _inputs(22)
    ids = jnp.zeros((B, L), jnp.int32)
    with pytest.raises(ValueError, match="kv_segment_ids"):
        ring_attention_sharded(q, k, v, mesh, None, kv_segment_ids=ids)
    spec = P(None, "seq", None, None)
    with pytest.raises(ValueError, match="kv_segment_ids"):
        jax.jit(jax.shard_map(
            lambda q, k, v, ks: ring_attention(q, k, v, None,
                                               kv_segment_ids=ks),
            mesh=mesh, in_specs=(spec,) * 3 + (P(None, "seq"),),
            out_specs=spec, check_vma=False))(q, k, v, ids)


def test_flash_ring_pad_row_gradients_consistent_with_forward():
    """Regression (r3 review finding 4): with an UNMASKED loss over pad
    rows (segment id < 0), the flash ring's gradients must linearize the
    forward it actually ran (pad rows output exactly zero) — not the
    XLA ring's pads-attend-pads semantics. Oracle: XLA ring with pad
    outputs explicitly zeroed."""
    from unidisc_tpu.parallel.ring_attention import (ring_attention,
                                                     ring_attention_flash)

    mesh = seq_mesh(4)
    q, k, v = _inputs(23)
    seg = np.repeat(np.arange(4), L // 4)[None].repeat(B, 0).astype(
        np.int32)
    seg[0, 48:] = -1  # pad tail on batch 0
    seg_j = jnp.asarray(seg)
    spec = P(None, "seq", None, None)
    sspec = P(None, "seq")

    def flash_loss(q, k, v):
        o = jax.shard_map(
            lambda q, k, v, s: ring_attention_flash(q, k, v, s),
            mesh=mesh, in_specs=(spec,) * 3 + (sspec,), out_specs=spec,
            check_vma=False)(q, k, v, seg_j)
        return jnp.sum(jnp.sin(o))  # pad rows included on purpose

    def ref_loss(q, k, v):
        o = jax.shard_map(
            lambda q, k, v, s: ring_attention(q, k, v, s),
            mesh=mesh, in_specs=(spec,) * 3 + (sspec,), out_specs=spec,
            check_vma=False)(q, k, v, seg_j)
        o = jnp.where((seg_j >= 0)[:, :, None, None], o, 0.0)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.jit(jax.grad(flash_loss, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5,
                                   err_msg=f"d{name}")
    # pad queries get zero gradient
    np.testing.assert_array_equal(np.asarray(g_flash[0])[0, 48:], 0.0)
