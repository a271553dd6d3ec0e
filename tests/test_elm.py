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
