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


def test_qdot_m_chunking_bit_identical(monkeypatch):
    """UNIDISC_QDOT_CHUNK_M (1.4B batch-knee mitigation, BASELINE.md)
    serializes trunk dots into M-chunks — outputs must be bit-identical,
    and the >8192-wide head plus non-divisible M must fall back."""
    from unidisc_tpu.ops import quant
    rng = np.random.default_rng(2)
    x = rng.normal(size=(32, 96)).astype(np.float32)
    w = rng.normal(size=(96, 128)).astype(np.float32)
    b = rng.normal(size=(128,)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), axis=0)
    args = (jnp.asarray(x), w_q, scale)
    y0 = np.asarray(qdot(*args, bias=jnp.asarray(b)))
    monkeypatch.setattr(quant, "_CHUNK_M", 8)
    y1 = np.asarray(qdot(*args, bias=jnp.asarray(b)))
    np.testing.assert_array_equal(y0, y1)
    monkeypatch.setattr(quant, "_CHUNK_M", 7)  # 32 % 7 != 0 -> fallback
    y2 = np.asarray(qdot(*args, bias=jnp.asarray(b)))
    np.testing.assert_array_equal(y0, y2)


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


def test_int8_kv_attention_close_to_fp():
    """int8 KV cache attention (ops/quant.int8_kv_attention) vs the bf16
    reference: per-(pos, head) scales keep the output within a few
    percent."""
    from unidisc_tpu.ops.attention import multihead_attention
    from unidisc_tpu.ops.quant import int8_kv_attention, quantize_kv

    rng = np.random.RandomState(0)
    B, l, L, H, D = 2, 1, 64, 4, 32
    q = jnp.asarray(rng.randn(B, l, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.float32)
    mask = jnp.asarray(rng.rand(B, 1, l, L) > 0.3)
    mask = mask.at[..., 0].set(True)  # no fully-masked rows

    ref = multihead_attention(q, k, v, mask=mask, backend="xla")
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    out = int8_kv_attention(q, kq, ks, vq, vs, mask=mask)
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    assert err < 0.03 * np.abs(np.asarray(ref)).mean() + 0.01


def test_int8_kv_cache_decode_close_to_full_forward():
    """AR cached decode with model.kv_cache_dtype='int8' tracks the full
    causal forward (reference KV parity pattern: test_ar_sampler.py, at
    int8 tolerance)."""
    from unidisc_tpu.sampling.ar_sampler import (init_kv_cache_for,
                                                 make_apply_token)

    B, L, TXT = 2, 24, 8
    cfg = Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": TXT,
        "model.img_length": L - TXT, "model.text_vocab_size": 20,
        "model.image_vocab_size": 20, "model.full_attention": False,
        "model.dropout": 0.0, "model.kv_cache_dtype": "int8",
        "trainer.parameterization": "ar"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 19, (B, L)), jnp.int32)
    modality = jnp.zeros((B, L), jnp.int32)
    sigma = jnp.zeros((B,), jnp.float32)

    full_logits = model.apply({"params": params}, x, sigma,
                              modality=modality)

    apply_token = make_apply_token(model)
    kv = init_kv_cache_for(m, B, L)
    assert len(kv) == 4 and kv[0].dtype == jnp.int8

    def body(kv, i):
        tok = jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)
        mod = jax.lax.dynamic_slice_in_dim(modality, i, 1, axis=1)
        logits, kv = apply_token(params, tok, kv, i, mod)
        return kv, logits[:, 0]

    _, step_logits = jax.lax.scan(body, kv, jnp.arange(L))
    step_logits = jnp.transpose(step_logits, (1, 0, 2))
    a, b = np.asarray(step_logits), np.asarray(full_logits)
    assert np.abs(a - b).mean() < 0.05 * np.abs(b).mean() + 0.05


def test_continuous_batching_int8_cache_consistent():
    """Continuous decoding on an int8 cache: a row decoding alongside
    others must produce exactly what it produces alone (same code path,
    per-row isolation)."""
    from unidisc_tpu.serving.continuous import build_continuous_decoder

    L = 32
    cfg = Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": L, "model.img_length": 0,
        "model.text_vocab_size": 24, "model.image_vocab_size": 0,
        "model.full_attention": False, "model.dropout": 0.0,
        "model.kv_cache_dtype": "int8",
        "trainer.parameterization": "ar", "sampling.cfg": None,
        "sampling.temperature": 0.0, "sampling.top_p": None})
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
    leaves = [p + 0.5 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    init_state, make_insert, decode, *_ = build_continuous_decoder(
        model, cfg, slots=2, chunk=4, eos_id=-1)

    def run(jobs):
        state = init_state()
        live = {}
        for s, (prompt, n_new) in enumerate(jobs):
            padded = np.zeros(8, np.int32)
            padded[:len(prompt)] = prompt
            state = make_insert(8)(params, state, s, jnp.asarray(padded),
                                   jnp.zeros(L, jnp.int32), len(prompt),
                                   n_new, 0.0, s)
            live[s] = len(prompt)
        for i in range(16):
            state = decode(params, state)
            if not np.asarray(state.active).any():
                break
        pos, x = np.asarray(state.pos), np.asarray(state.x)
        return {s: x[s, p:pos[s] + 1] for s, p in live.items()}

    jobs = [([3, 7, 1], 6), ([9, 2, 4, 4, 8], 5)]
    together = run(jobs)
    solo0 = run(jobs[:1])
    np.testing.assert_array_equal(together[0], solo0[0])
    assert len(together[1]) == 5
