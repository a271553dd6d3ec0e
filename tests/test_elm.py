"""OpenELM AR baseline tests (reference: models/elm_custom.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.models.elm import (ELM_PRESETS, ELMConfig, OpenELM,
                                    init_elm, init_elm_cache)


def test_layerwise_scaling():
    cfg = ELM_PRESETS["270m"]
    qh = cfg.layer_q_heads()
    ffn = cfg.layer_ffn_dims()
    assert len(qh) == cfg.num_layers
    # heads and ffn grow with depth (layer-wise scaling)
    assert qh[-1] > qh[0]
    assert ffn[-1] > ffn[0]
    assert all(f % cfg.ffn_dim_divisor == 0 for f in ffn)
    kvh = cfg.layer_kv_heads()
    assert all(q % kv == 0 for q, kv in zip(qh, kvh))


def test_forward_shapes_and_vocab():
    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.total_vocab, (2, 16)))
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 16, cfg.total_vocab)
    assert logits.dtype == jnp.float32


def test_causality():
    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.total_vocab, (1, 16))
    base = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    ids2 = ids.copy()
    ids2[0, 10] = (ids2[0, 10] + 1) % cfg.total_vocab
    pert = np.asarray(model.apply({"params": params}, jnp.asarray(ids2)))
    # positions before 10 unchanged; position >= 10 changed
    np.testing.assert_allclose(base[0, :10], pert[0, :10], atol=1e-5)
    assert np.abs(base[0, 10:] - pert[0, 10:]).max() > 1e-4


def test_kv_cache_decode_matches_full():
    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    L = 12
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.total_vocab, (2, L)))
    full = np.asarray(model.apply({"params": params}, ids))

    caches = init_elm_cache(cfg, 2, L)
    outs = []
    for i in range(L):
        logits, caches = model.apply({"params": params}, ids[:, i:i + 1],
                                     kv_cache=caches, cache_index=i)
        outs.append(np.asarray(logits)[:, 0])
    step = np.stack(outs, axis=1)
    np.testing.assert_allclose(step, full, atol=2e-2, rtol=1e-2)


def test_int8_elm_tracks_fp():
    """int8 W8A8 ELM (quantize_elm_params + quant='int8') ranks tokens
    like the fp model, including the quantized shared-embedding head."""
    import dataclasses

    from unidisc_tpu.models.elm import OpenELM
    from unidisc_tpu.ops.quant import quantize_elm_params

    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    qcfg = dataclasses.replace(cfg, quant="int8")
    qmodel = OpenELM(qcfg)
    qparams = quantize_elm_params(params, cfg)
    # structure check vs a quant-mode init
    expected = jax.tree_util.tree_structure(
        qmodel.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 8), jnp.int32))["params"])
    assert jax.tree_util.tree_structure(qparams) == expected

    ids = jnp.asarray(np.random.RandomState(1).randint(
        0, cfg.total_vocab, (2, 16)))
    lf = np.asarray(model.apply({"params": params}, ids), np.float64)
    lq = np.asarray(qmodel.apply({"params": qparams}, ids), np.float64)
    a, b = lf.reshape(-1), lq.reshape(-1)
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert cos > 0.99, cos
    assert (lf.argmax(-1) == lq.argmax(-1)).mean() > 0.9


def test_int8_elm_kv_decode():
    """Quantized ELM runs the KV-cache decode path."""
    import dataclasses

    from unidisc_tpu.models.elm import OpenELM, init_elm_cache
    from unidisc_tpu.ops.quant import quantize_elm_params

    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    qcfg = dataclasses.replace(cfg, quant="int8")
    qmodel = OpenELM(qcfg)
    qparams = quantize_elm_params(params, cfg)
    cache = init_elm_cache(cfg, batch=1, max_len=16)
    ids = jnp.asarray(np.random.RandomState(2).randint(
        0, cfg.total_vocab, (1, 16)))
    full = np.asarray(qmodel.apply({"params": qparams}, ids))
    logits = []
    for i in range(16):
        step, cache = qmodel.apply({"params": qparams}, ids[:, i:i + 1],
                                   kv_cache=cache, cache_index=i)
        logits.append(np.asarray(step)[:, 0])
    dec = np.stack(logits, 1)
    # decode path matches the full forward (same quantized math)
    np.testing.assert_allclose(dec, full, rtol=0.05, atol=0.05)


def test_elm_int8_kv_cache_decode_tracks_full():
    """int8 KV cache decode (quant=True cache + int8_kv_attention with
    GQA head repeat) tracks the full forward at int8 tolerance."""
    from unidisc_tpu.models.elm import init_elm_cache

    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    cache = init_elm_cache(cfg, batch=2, max_len=16, quant=True)
    assert len(cache[0]) == 4 and cache[0][0].dtype == jnp.int8
    ids = jnp.asarray(np.random.RandomState(3).randint(
        0, cfg.total_vocab, (2, 16)))
    full = np.asarray(model.apply({"params": params}, ids))
    logits = []
    for i in range(16):
        step, cache = model.apply({"params": params}, ids[:, i:i + 1],
                                  kv_cache=cache, cache_index=i)
        logits.append(np.asarray(step)[:, 0])
    dec = np.stack(logits, 1)
    err = np.abs(dec - full).mean()
    assert err < 0.05 * np.abs(full).mean() + 0.05


def test_elm_vector_cache_index_matches_scalar():
    """Per-row cache positions: rows decoding at different depths must
    produce the same logits as lockstep scalar-index decode."""
    from unidisc_tpu.models.elm import init_elm_cache

    cfg = ELM_PRESETS["tiny"]
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.RandomState(4).randint(
        0, cfg.total_vocab, (2, 8)))

    # scalar lockstep decode
    cache = init_elm_cache(cfg, batch=2, max_len=16)
    ref = []
    for i in range(8):
        step, cache = model.apply({"params": params}, ids[:, i:i + 1],
                                  kv_cache=cache, cache_index=i)
        ref.append(np.asarray(step)[:, 0])

    # vector decode: both rows advance together but through the
    # vector-index path
    cache = init_elm_cache(cfg, batch=2, max_len=16)
    got = []
    for i in range(8):
        step, cache = model.apply(
            {"params": params}, ids[:, i:i + 1], kv_cache=cache,
            cache_index=jnp.full((2,), i, jnp.int32))
        got.append(np.asarray(step)[:, 0])
    np.testing.assert_allclose(np.stack(got, 1), np.stack(ref, 1),
                               rtol=2e-2, atol=2e-2)
