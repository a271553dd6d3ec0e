"""W8A8 int8 inference quantization tests (ops/quant.py; no reference
counterpart — the reference serves bf16/fp16, this is the TPU int8-MXU
inference path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import DIT, init_dit
from unidisc_tpu.ops.quant import (dynamic_quantize, qdot,
                                   quantize_dit_params,
                                   quantize_per_channel)


def test_weight_quant_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), axis=0)
    assert w_q.dtype == jnp.int8 and scale.shape == (128,)
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)[None, :]
    # max error bounded by scale/2 per channel
    err = np.abs(deq - w).max(0)
    assert (err <= np.asarray(scale) * 0.5 + 1e-7).all()


def test_weight_quant_zero_channel():
    w = jnp.zeros((8, 4))
    w_q, scale = quantize_per_channel(w, axis=0)
    assert (np.asarray(w_q) == 0).all() and (np.asarray(scale) == 1.0).all()


def test_dynamic_quantize_rows():
    x = jnp.asarray([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]])
    x_q, s = dynamic_quantize(x)
    assert x_q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(x_q)[0], [64, -127, 32], atol=1)
    assert (np.asarray(x_q)[1] == 0).all()  # all-zero row is safe


def test_qdot_matches_fp_dot():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 16, 96)).astype(np.float32)
    w = rng.normal(size=(96, 128)).astype(np.float32)
    b = rng.normal(size=(128,)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), axis=0)
    y_q = np.asarray(qdot(jnp.asarray(x), w_q, scale, bias=jnp.asarray(b),
                          out_dtype=jnp.float32))
    y = x.reshape(-1, 96) @ w + b
    y = y.reshape(4, 16, 128)
    # relative error of W8A8 at these sizes: ~1% of the output scale
    denom = np.abs(y).mean()
    assert np.abs(y_q - y).mean() / denom < 0.02
    assert y_q.shape == y.shape


def _tiny_cfg(**kw):
    return Config.make("tiny").override(**{
        "model.length": 32, "model.txt_length": 16, "model.img_length": 16,
        "model.text_vocab_size": 40, "model.image_vocab_size": 24,
        "model.hidden_size": 64, "model.n_heads": 4, "model.n_blocks": 2,
        "model.zero_linear_init": False,
        "model.dropout": 0.0, **kw})


def test_quant_dit_close_to_fp():
    """int8 DIT logits track the fp model closely enough to rank tokens
    the same way most of the time."""
    cfg = _tiny_cfg()
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    qcfg = dataclasses.replace(cfg.model, quant="int8")
    qmodel = DIT(qcfg)
    qparams = quantize_dit_params(params)
    # the quant tree matches the quant module's expected structure
    expected = jax.tree_util.tree_structure(
        qmodel.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 32), jnp.int32), jnp.zeros((1,)),
                    modality=jnp.zeros((1, 32), jnp.int32))["params"])
    assert jax.tree_util.tree_structure(qparams) == expected

    x = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, 64)
    sigma = jnp.full((2,), 0.5)
    modality = jnp.zeros((2, 32), jnp.int32)
    logits_fp = model.apply({"params": params}, x, sigma,
                            modality=modality)
    logits_q = qmodel.apply({"params": qparams}, x, sigma,
                            modality=modality)
    assert logits_q.shape == logits_fp.shape
    a = np.asarray(logits_fp, np.float64).reshape(-1)
    b = np.asarray(logits_q, np.float64).reshape(-1)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos
    # top-1 agreement across positions
    top_fp = np.asarray(logits_fp).argmax(-1)
    top_q = np.asarray(logits_q).argmax(-1)
    assert (top_fp == top_q).mean() > 0.9


def test_quant_sampler_runs():
    """The full one-scan sampler runs under int8 quant mode."""
    from unidisc_tpu.sampling.sampler import build_sampler

    cfg = _tiny_cfg(**{"sampling.steps": 4,
                       "sampling.predictor": "maskgit",
                       "model.force_argmax_valid_indices": True})
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    qcfg = dataclasses.replace(cfg.model, quant="int8")
    qmodel = DIT(qcfg)
    qparams = quantize_dit_params(params)

    def fwd(p, x, sigma, modality):
        return qmodel.apply({"params": p}, x, sigma, modality=modality)

    sampler = build_sampler(fwd, cfg)
    b, l = 2, cfg.model.length
    x0 = jnp.zeros((b, l), jnp.int32)
    unmask = jnp.zeros((b, l), bool)
    modality = jnp.concatenate([
        jnp.zeros((b, 16), jnp.int32), jnp.ones((b, 16), jnp.int32)], -1)
    out = sampler(qparams, jax.random.PRNGKey(2), x0, unmask, modality)
    toks = np.asarray(out.tokens)
    assert toks.shape == (b, l)
    assert (toks != cfg.model.mask_index).all()


def test_engine_quantized_serving():
    """build_engine(quantize='int8') serves a t2i request end-to-end."""
    import dataclasses as _dc

    from unidisc_tpu.models.dit import DIT as _DIT
    from unidisc_tpu.ops.quant import quantize_dit_params as _qp
    from unidisc_tpu.serving.engine import InferenceEngine

    cfg = _tiny_cfg(**{"sampling.steps": 2,
                       "sampling.predictor": "maskgit",
                       "model.force_argmax_valid_indices": True,
                       "model.text_vocab_size": 261})
    from unidisc_tpu.models.dit import init_dit as _init
    model, params = _init(jax.random.PRNGKey(0), cfg.model)
    qm = _dc.replace(cfg.model, quant="int8")
    eng = InferenceEngine(_dc.replace(cfg, model=qm), DIT(qm),
                          quantize_dit_params(params))
    out = eng.run(text="a cat", task="gen_image", seed=1)
    ids = np.asarray(out["image_ids"])
    assert ids.shape[-1] == cfg.model.img_length
    assert (ids >= 0).all() and (ids < cfg.model.image_vocab_size).all()


def test_quant_sharded_sampling_8dev():
    """int8 params shard over the FSDP mesh (int8 kernels via the
    largest-dim rule, per-channel scales alongside) and the quantized
    sampler runs SPMD — serving-at-scale with quantization."""
    import dataclasses as _dc

    from unidisc_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           params_shardings)
    from unidisc_tpu.sampling.sampler import build_sampler

    cfg = _tiny_cfg(**{"mesh.fsdp": 8, "sampling.steps": 2,
                       "sampling.predictor": "maskgit",
                       "sampling.cfg": 1.5,
                       "model.force_argmax_valid_indices": True})
    mesh = make_mesh(cfg.mesh)
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    qm = _dc.replace(cfg.model, quant="int8")
    qmodel = DIT(qm)
    qparams = quantize_dit_params(params)
    qparams = jax.device_put(qparams, params_shardings(qparams, mesh))
    # at least one int8 kernel actually sharded across the mesh
    flat = jax.tree_util.tree_leaves(qparams)
    assert any(l.dtype == jnp.int8 and
               not l.sharding.is_fully_replicated for l in flat)

    def fw(p, x, sigma, modality):
        return qmodel.apply({"params": p}, x, sigma, modality=modality)

    sample = jax.jit(build_sampler(fw, cfg))
    B, L = 16, cfg.model.length
    x0 = jax.device_put(jnp.zeros((B, L), jnp.int32), batch_sharding(mesh))
    unmask = jax.device_put(jnp.zeros((B, L), bool), batch_sharding(mesh))
    modality = jax.device_put(
        jnp.concatenate([jnp.zeros((B, 16), jnp.int32),
                         jnp.ones((B, 16), jnp.int32)], -1),
        batch_sharding(mesh))
    out = sample(qparams, jax.random.PRNGKey(2), x0, unmask, modality)
    toks = np.asarray(out.tokens)
    assert toks.shape == (B, L)
    assert not (toks == cfg.model.mask_index).any()
