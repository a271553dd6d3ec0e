"""Fused prologue+int8-matmul kernel tests (ops/fused_qmm.py).

The kernel (interpret mode on CPU) must match the XLA reference
elementwise — same norm, same adaLN gating, same dynamic-quantization
rounding, same int32 accumulation. End-to-end, a quant_fused DIT must
agree with the unfused int8 DIT to bf16 grain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.ops.fused_qmm import _xla_reference, fused_qmm

K, N = 256, 384
B, L = 2, 128
M = B * L


def _inputs(seed=0, bias=True):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(M, K) * 0.5, jnp.bfloat16)
    w_q = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    w_scale = jnp.asarray(rng.rand(N) * 0.02 + 0.001, jnp.float32)
    b = jnp.asarray(rng.randn(N) * 0.1, jnp.float32) if bias else None
    norm_w = jnp.asarray(rng.rand(K) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(B, K) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.randn(B, K) * 0.2, jnp.float32)
    modality = jnp.asarray(rng.randint(0, 2, (M,)), jnp.int32)
    return x, w_q, w_scale, b, norm_w, shift, scale, modality


@pytest.mark.parametrize("norm_type", ["layernorm", "rms"])
def test_adaln_norm_mode_matches_reference(norm_type):
    x, w_q, w_scale, b, norm_w, shift, scale, modality = _inputs()
    out = fused_qmm(x, w_q, w_scale, bias=b, mode="adaln_norm",
                    norm_type=norm_type, norm_w=norm_w, shift=shift,
                    scale=scale, modality=modality, rows_per_batch=L,
                    block_m=128, block_n=128)
    ref = _xla_reference(x, w_q, w_scale, b, "adaln_norm", norm_type,
                         norm_w, jnp.repeat(shift, L, 0),
                         jnp.repeat(scale, L, 0),
                         modality[:, None], jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_norm_without_cond():
    x, w_q, w_scale, b, norm_w, *_ = _inputs(1)
    out = fused_qmm(x, w_q, w_scale, bias=b, mode="adaln_norm",
                    norm_type="layernorm", norm_w=norm_w,
                    block_m=128, block_n=128)
    ref = _xla_reference(x, w_q, w_scale, b, "adaln_norm", "layernorm",
                         norm_w, None, None, None, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("mode", ["gelu", "none"])
def test_pointwise_modes(mode):
    x, w_q, w_scale, b, *_ = _inputs(2)
    out = fused_qmm(x, w_q, w_scale, bias=b, mode=mode,
                    block_m=128, block_n=128)
    ref = _xla_reference(x, w_q, w_scale, b, mode, "layernorm",
                         None, None, None, None, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_untileable_shapes_fall_back():
    """M not a multiple of 128 -> XLA fallback, same semantics."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(40, K), jnp.bfloat16)
    w_q = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    w_scale = jnp.asarray(rng.rand(N) * 0.02 + 0.001, jnp.float32)
    out = fused_qmm(x, w_q, w_scale, mode="gelu")
    ref = _xla_reference(x, w_q, w_scale, None, "gelu", "layernorm",
                         None, None, None, None, jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))


def test_fused_dit_matches_unfused_int8():
    """End-to-end: quant_fused DIT logits ~= unfused int8 DIT logits.
    (The fused path keeps the prologue in fp32 where the unfused one
    round-trips through bf16, so agreement is to bf16 grain.)"""
    import dataclasses

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import DIT, init_dit
    from unidisc_tpu.ops.quant import quantize_dit_params

    cfg = Config.make("tiny").override(**{
        "model.length": 256, "model.txt_length": 128,
        "model.img_length": 128, "model.hidden_size": 128,
        "model.n_heads": 4, "model.text_vocab_size": 40,
        "model.image_vocab_size": 24, "model.dropout": 0.0,
        "model.time_conditioning": True,
    })
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    # perturb so the zero-init head produces nonzero logits
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [p + 0.1 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    qparams = quantize_dit_params(params)

    x = jax.random.randint(jax.random.PRNGKey(2), (2, m.length), 0,
                           m.vocab_size)
    sigma = jnp.full((2,), 0.4)
    modality = jnp.concatenate([
        jnp.zeros((2, m.txt_length), jnp.int32),
        jnp.ones((2, m.img_length), jnp.int32)], axis=-1)

    outs = {}
    for fused in (False, True):
        qm = dataclasses.replace(m, quant="int8", quant_fused=fused)
        outs[fused] = DIT(qm).apply({"params": qparams}, x, sigma,
                                    modality=modality)
    a = np.asarray(outs[False], np.float32)
    b = np.asarray(outs[True], np.float32)
    # same quantized weights; activations differ only by fp32-vs-bf16
    # prologue rounding
    assert np.mean(np.abs(a - b)) < 0.05 * (np.mean(np.abs(a)) + 1e-6) + 0.05
    # and the fused path must actually produce finite, varied logits
    assert np.isfinite(b).all() and b.std() > 0


def test_cached_decode_ignores_quant_fused():
    """AR cached decode (l=1) must keep working with quant_fused=True —
    the block falls back to the unfused path when kv_cache is present."""
    import dataclasses

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import DIT, init_dit
    from unidisc_tpu.ops.quant import quantize_dit_params
    from unidisc_tpu.sampling.ar_sampler import init_kv_cache

    cfg = Config.make("tiny").override(**{
        "model.length": 16, "model.txt_length": 16, "model.img_length": 0,
        "model.text_vocab_size": 24, "model.image_vocab_size": 0,
        "model.full_attention": False, "model.dropout": 0.0,
        "trainer.parameterization": "ar"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qparams = quantize_dit_params(params)
    qm = dataclasses.replace(m, quant="int8", quant_fused=True)
    qmodel = DIT(qm)
    kv = init_kv_cache(m.n_blocks, 1, 16, m.n_heads, m.head_dim)
    tok = jnp.zeros((1, 1), jnp.int32)
    logits, kv = qmodel.apply({"params": qparams}, tok,
                              jnp.zeros((1,)), modality=tok * 0,
                              kv_cache=kv, cache_index=0)
    assert logits.shape == (1, 1, 24)
    assert np.isfinite(np.asarray(logits)).all()
