"""Tests for the Flax DIT backbone (reference semantics: models/dit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import ModelConfig
from unidisc_tpu.models.dit import DIT, count_params, init_dit
from unidisc_tpu.models.rotary import apply_rope, build_multimodal_rope, rope_1d, rope_2d_lumina


def tiny_cfg(**kw):
    base = dict(name="tiny", hidden_size=64, cond_dim=32, n_blocks=2, n_heads=2,
                length=24, txt_length=8, img_length=16, text_vocab_size=11,
                image_vocab_size=5, dropout=0.0)
    base.update(kw)
    return ModelConfig(**base)


def test_dit_forward_shapes_and_zero_init():
    cfg = tiny_cfg()
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.length), 0, cfg.vocab_size)
    logits = model.apply({"params": params}, tokens)
    assert logits.shape == (2, cfg.length, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    # zero-initialized output head -> logits are exactly zero at init
    np.testing.assert_allclose(np.asarray(logits), 0.0)


def test_dit_time_conditioning_and_modality():
    cfg = tiny_cfg(time_conditioning=True, modality_embed=True,
                   zero_linear_init=False)
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.length), 0, cfg.vocab_size)
    modality = jnp.concatenate([jnp.zeros((2, cfg.txt_length), jnp.int32),
                                jnp.ones((2, cfg.img_length), jnp.int32)], axis=-1)
    sigma_a = jnp.array([0.1, 0.1])
    sigma_b = jnp.array([2.0, 2.0])
    la = model.apply({"params": params}, tokens, sigma_a, modality=modality)
    lb = model.apply({"params": params}, tokens, sigma_b, modality=modality)
    la, lb = np.asarray(la), np.asarray(lb)
    assert la.shape == (2, cfg.length, cfg.vocab_size)
    # adaLN is zero-init; at init sigma has no effect yet (gates are 0)
    np.testing.assert_allclose(la, lb, atol=1e-5)


def test_dit_sigma_affects_output_after_perturbation():
    cfg = tiny_cfg(time_conditioning=True, modality_embed=True,
                   zero_linear_init=False)
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    # perturb adaLN weights away from zero-init so conditioning is live
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(7), p.shape), params)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.length), 0, cfg.vocab_size)
    modality = jnp.concatenate([jnp.zeros((2, cfg.txt_length), jnp.int32),
                                jnp.ones((2, cfg.img_length), jnp.int32)], axis=-1)
    la = np.asarray(model.apply({"params": params}, tokens, jnp.array([0.1, 0.1]), modality=modality))
    lb = np.asarray(model.apply({"params": params}, tokens, jnp.array([2.0, 2.0]), modality=modality))
    img_delta = np.abs(la[:, cfg.txt_length:] - lb[:, cfg.txt_length:]).max()
    assert img_delta > 1e-4  # image tokens are time-conditioned
    # text positions change only via attention mixing from image tokens —
    # direct modulation is masked out; check image delta dominates
    txt_direct = np.abs(la[:, :cfg.txt_length] - lb[:, :cfg.txt_length]).max()
    assert img_delta > txt_direct


@pytest.mark.parametrize("flags", [
    dict(norm_type="rms", qk_norm=True, sandwich_normalization=True,
         modality_embed=True, rope_2d=True),
    dict(full_attention=False),  # causal/AR mode
])
def test_dit_variants_run(flags):
    cfg = tiny_cfg(zero_linear_init=False, **flags)
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.length), 0, cfg.vocab_size)
    modality = jnp.concatenate([jnp.zeros((2, cfg.txt_length), jnp.int32),
                                jnp.ones((2, cfg.img_length), jnp.int32)], axis=-1)
    logits = model.apply({"params": params}, tokens, modality=modality)
    assert np.isfinite(np.asarray(logits)).all()


def test_causal_masking_is_causal():
    cfg = tiny_cfg(full_attention=False, zero_linear_init=False)
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    t1 = jax.random.randint(jax.random.PRNGKey(1), (1, cfg.length), 0, cfg.vocab_size)
    # changing a future token must not change logits at earlier positions
    t2 = t1.at[0, -1].set((t1[0, -1] + 1) % cfg.vocab_size)
    l1 = np.asarray(model.apply({"params": params}, t1))
    l2 = np.asarray(model.apply({"params": params}, t2))
    np.testing.assert_allclose(l1[0, :-1], l2[0, :-1], atol=1e-5)
    assert np.abs(l1[0, -1] - l2[0, -1]).max() > 1e-6


def test_kv_cache_decode_matches_full_forward():
    cfg = tiny_cfg(full_attention=False, zero_linear_init=False, length=12,
                   txt_length=12, img_length=0)
    model, params = init_dit(jax.random.PRNGKey(0), cfg, compute_dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.length), 0, cfg.vocab_size)
    full = np.asarray(model.apply({"params": params}, tokens))

    # incremental decode with kv cache, one token at a time
    b, h, d = 2, cfg.n_heads, cfg.head_dim
    cache = (jnp.zeros((cfg.n_blocks, b, cfg.length, h, d), jnp.float32),
             jnp.zeros((cfg.n_blocks, b, cfg.length, h, d), jnp.float32))
    step = jax.jit(lambda p, tok, c, i: model.apply(
        {"params": p}, tok, kv_cache=c, cache_index=i))
    outs = []
    for i in range(cfg.length):
        logits, cache = step(params, tokens[:, i:i + 1], cache, jnp.int32(i))
        outs.append(np.asarray(logits)[:, 0])
    inc = np.stack(outs, axis=1)
    np.testing.assert_allclose(inc, full, atol=2e-4, rtol=1e-3)


def test_rope_tables():
    cos, sin = rope_1d(16, 8)
    assert cos.shape == (16, 4) and sin.shape == (16, 4)
    np.testing.assert_allclose(cos[0], 1.0)
    np.testing.assert_allclose(sin[0], 0.0)

    cos2, sin2 = rope_2d_lumina(16, 8)  # 4x4 grid
    assert cos2.shape == (16, 4)
    # position (0,0) has zero angle
    np.testing.assert_allclose(cos2[0], 1.0)
    # axial structure: moving one row changes even slots only
    row1 = 4  # (1, 0)
    np.testing.assert_allclose(cos2[row1][1::2], cos2[0][1::2])
    assert not np.allclose(cos2[row1][0::2], cos2[0][0::2])


def test_apply_rope_norm_preserving():
    cos, sin = rope_1d(6, 8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 3, 8))
    out = apply_rope(x, jnp.asarray(cos), jnp.asarray(sin))
    # rotation preserves pairwise norms
    n_in = np.asarray(jnp.sqrt(x[..., :4] ** 2 + x[..., 4:] ** 2))
    n_out = np.asarray(jnp.sqrt(out[..., :4] ** 2 + out[..., 4:] ** 2))
    np.testing.assert_allclose(n_in, n_out, rtol=1e-5)
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]), rtol=1e-6)


def test_param_count_extra_large_is_1p4b_class():
    from unidisc_tpu.config import MODEL_PRESETS
    cfg = MODEL_PRESETS["extra_large"]
    # analytic param count: blocks dominate: 12*h^2 per block (qkv 3h^2 + out
    # h^2 + mlp 8h^2) + embed/head 2*V*h
    approx = cfg.n_blocks * 12 * cfg.hidden_size ** 2 + 2 * cfg.vocab_size * cfg.hidden_size
    assert 1.2e9 < approx < 1.8e9
