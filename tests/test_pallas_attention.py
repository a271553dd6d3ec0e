"""Pallas flash-attention equivalence tests (interpret mode on CPU; the
same kernel compiles on TPU). Oracle = XLA einsum attention with identical
masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.ops.pallas_attention import _xla_reference, flash_attention

B, H, D = 2, 3, 64


def make_qkv(lq, lk, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, lq, H, D), dtype)
    k = jax.random.normal(ks[1], (B, lk, H, D), dtype)
    v = jax.random.normal(ks[2], (B, lk, H, D), dtype)
    return q, k, v


def to_bhld(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def check(lq, lk, causal=False, segment_ids=None, atol=2e-3):
    q, k, v = make_qkv(lq, lk)
    out = flash_attention(q, k, v, causal=causal, segment_ids=segment_ids)
    ref = _xla_reference(to_bhld(q), to_bhld(k), to_bhld(v),
                         segment_ids, causal, 1.0 / (D ** 0.5))
    ref = jnp.transpose(ref, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=atol, rtol=1e-3)


def test_plain_attention_tile_aligned():
    check(256, 256)


def test_plain_attention_unaligned_lengths():
    check(100, 100)      # padding path: lengths not multiples of 128


def test_causal():
    check(256, 256, causal=True)


def test_causal_unaligned():
    check(200, 200, causal=True)


def test_segment_ids_packed_batch():
    lq = 256
    segs = np.zeros((B, lq), np.int32)
    segs[:, 100:200] = 1
    segs[:, 200:] = 2
    segs[0, 250:] = -1  # padding tokens attend to nothing
    seg = jnp.asarray(segs)
    check(lq, lq, segment_ids=(seg, seg))


def test_multi_tile_online_softmax():
    # kv spans 4 tiles: exercises running-max correction across tiles
    check(128, 512)


def test_bf16_inputs():
    q, k, v = make_qkv(256, 256, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = _xla_reference(to_bhld(q), to_bhld(k), to_bhld(v), None, False,
                         1.0 / (D ** 0.5))
    ref = jnp.transpose(ref, (0, 2, 1, 3))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_gradients_flow():
    q, k, v = make_qkv(128, 128)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, causal=True).sum()

    def loss_ref(q, k, v):
        return jnp.transpose(
            _xla_reference(to_bhld(q), to_bhld(k), to_bhld(v), None, True,
                           1.0 / (D ** 0.5)), (0, 2, 1, 3)).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3)


def test_arbitrary_mask_rejected():
    q, k, v = make_qkv(128, 128)
    with pytest.raises(NotImplementedError):
        flash_attention(q, k, v, mask=jnp.ones((B, 128, 128), bool))


def test_gradients_with_segments_and_padding():
    lq = 200  # unaligned: exercises padded backward
    q, k, v = make_qkv(lq, lq, seed=3)
    segs = np.zeros((B, lq), np.int32)
    segs[:, 120:] = 1
    segs[1, 190:] = -1
    seg = (jnp.asarray(segs), jnp.asarray(segs))

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, segment_ids=seg).astype(
            jnp.float32).sum()

    def loss_ref(q, k, v):
        return jnp.transpose(
            _xla_reference(to_bhld(q), to_bhld(k), to_bhld(v), seg, False,
                           1.0 / (D ** 0.5)), (0, 2, 1, 3)).astype(
                               jnp.float32).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=2e-3)


def test_gradients_multi_tile():
    q, k, v = make_qkv(128, 512, seed=4)  # kv spans multiple tiles

    def loss_flash(q, k, v):
        return flash_attention(q, k, v).astype(jnp.float32).sum()

    def loss_ref(q, k, v):
        return jnp.transpose(
            _xla_reference(to_bhld(q), to_bhld(k), to_bhld(v), None, False,
                           1.0 / (D ** 0.5)), (0, 2, 1, 3)).astype(
                               jnp.float32).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-3, rtol=2e-3)
