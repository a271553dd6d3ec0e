"""LoRA fine-tuning tests (training/lora.py).

Reference behavior being mirrored: peft LoraConfig(r=16, lora_alpha=32,
target_modules=["qkv_proj"], bias="none") around the ELM backbone with
token_embeddings_extra kept fully trainable (model_setup.py:175-188).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from unidisc_tpu.config import Config, ModelConfig
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.models.elm import ELMConfig, init_elm
from unidisc_tpu.training.lora import (count_lora_params, init_lora,
                                       load_lora, lora_param_map,
                                       merge_lora, save_lora)


def small_model_cfg(**kw):
    base = dict(hidden_size=64, n_blocks=2, n_heads=2, cond_dim=32,
                length=32, txt_length=16, img_length=16,
                text_vocab_size=97, image_vocab_size=31)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def dit_setup():
    cfg = small_model_cfg()
    model, params = init_dit(jax.random.PRNGKey(0), cfg)
    return cfg, model, params


def test_init_matches_only_targets(dit_setup):
    _, _, params = dit_setup
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4)
    lora_flat = traverse_util.flatten_dict(adapter["lora"])
    kernel_paths = {p[:-1] for p in lora_flat}
    # DIT scan-stacked qkv kernel only
    assert kernel_paths == {("blocks", "attention", "attn_qkv", "kernel")}
    a = lora_flat[("blocks", "attention", "attn_qkv", "kernel", "a")]
    b = lora_flat[("blocks", "attention", "attn_qkv", "kernel", "b")]
    assert a.shape == (2, 64, 4) and b.shape == (2, 4, 192)
    assert np.all(np.asarray(b) == 0)
    # adapter is tiny vs the base
    n_base = sum(int(np.prod(l.shape))
                 for l in jax.tree_util.tree_leaves(params))
    assert count_lora_params(adapter) < 0.05 * n_base


def test_merge_identity_at_init(dit_setup):
    cfg, model, params = dit_setup
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = merge_lora(params, adapter, alpha=8.0, rank=4)
    x = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 128)
    sigma = jnp.full((2,), 0.5)
    y0 = model.apply({"params": params}, x, sigma, deterministic=True)
    y1 = model.apply({"params": merged}, x, sigma, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0,
                               rtol=0)


def test_merge_touches_only_target_kernels(dit_setup):
    _, _, params = dit_setup
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # give b nonzero values so deltas are visible
    adapter = jax.tree_util.tree_map(
        lambda l: jnp.ones_like(l) * 0.01, adapter)
    merged = merge_lora(params, adapter, alpha=8.0, rank=4)
    f0 = traverse_util.flatten_dict(params)
    f1 = traverse_util.flatten_dict(merged)
    for path in f0:
        same = np.array_equal(np.asarray(f0[path]), np.asarray(f1[path]))
        if path == ("blocks", "attention", "attn_qkv", "kernel"):
            assert not same, "target kernel should change"
        else:
            assert same, f"non-target leaf changed: {path}"


def test_elm_qkv_proj_and_train_full():
    cfg = ELMConfig(model_dim=64, num_layers=2, head_dim=32,
                    vocab_size=128, max_length=64)
    model, params = init_elm(jax.random.PRNGKey(0), cfg)
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4,
                        train_full=("token_embeddings_extra",))
    lora_paths = {p[:-2] for p in
                  traverse_util.flatten_dict(adapter["lora"])}
    assert ("layer_0", "attn", "qkv_proj") in lora_paths
    assert ("layer_1", "attn", "qkv_proj") in lora_paths
    full = traverse_util.flatten_dict(adapter["full"])
    assert ("token_embeddings_extra",) in full
    # full delta trains the raw leaf: merged = base + delta
    adapter["full"]["token_embeddings_extra"] = (
        adapter["full"]["token_embeddings_extra"] + 1.0)
    merged = merge_lora(params, adapter, alpha=8.0, rank=4)
    np.testing.assert_allclose(
        np.asarray(merged["token_embeddings_extra"]),
        np.asarray(params["token_embeddings_extra"]) + 1.0, rtol=1e-6)


def test_lora_train_step_learns_and_freezes_base():
    """End-to-end: LoRA train step reduces loss; base tree untouched;
    only adapter leaves get gradient updates."""
    import dataclasses as dc

    from unidisc_tpu.config import TrainerConfig
    from unidisc_tpu.training.train_state import (init_train_state,
                                                  make_train_step)
    # zero_linear_init=False: with the base FROZEN, a zero-init final
    # projection would never become nonzero, so no gradient could reach
    # the trunk adapters — real LoRA runs start from a trained checkpoint
    mc = small_model_cfg(lora_rank=4, lora_alpha=8.0,
                         zero_linear_init=False)
    config = Config(model=mc,
                    trainer=TrainerConfig(lr=3e-3, warmup_steps=1))
    model, base = init_dit(jax.random.PRNGKey(0), mc)
    base_copy = jax.tree_util.tree_map(np.asarray, base)

    adapter = init_lora(jax.random.PRNGKey(1), base, rank=4)
    pmap = lora_param_map(base, alpha=8.0, rank=4)
    state = init_train_state(config, adapter)
    step = jax.jit(make_train_step(config, model, param_map=pmap))

    batch = {
        "input_ids": jax.random.randint(
            jax.random.PRNGKey(3), (8, 32), 0, 96),
        "modality": jnp.zeros((8, 32), jnp.int32),
    }
    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(80):
        state, m = step(state, batch, rng)
        losses.append(float(m.loss))
    # stochastic per-step t-sampling: compare windowed means, not endpoints
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:]))
    # base unchanged
    for p, leaf in traverse_util.flatten_dict(base).items():
        np.testing.assert_array_equal(
            np.asarray(leaf),
            traverse_util.flatten_dict(base_copy)[p])
    # adapter actually moved
    b = traverse_util.flatten_dict(state.params["lora"])[
        ("blocks", "attention", "attn_qkv", "kernel", "b")]
    assert float(jnp.abs(b).max()) > 0


def test_trainer_lora_mode(tmp_path):
    """Trainer builds the LoRA state when model.lora_rank > 0 and the
    checkpointed params are the adapter tree (rank-r sized). A random
    base requires zero_linear_init=False (else the frozen zero head
    blocks all adapter gradients — Trainer refuses that combination)."""
    from unidisc_tpu.training.trainer import Trainer
    with pytest.raises(ValueError, match="zero_linear_init"):
        Trainer(Config(model=small_model_cfg(lora_rank=4, lora_alpha=8.0)),
                str(tmp_path / "bad"), log_every=1000)

    mc = small_model_cfg(lora_rank=4, lora_alpha=8.0,
                         zero_linear_init=False)
    config = Config(model=mc)
    tr = Trainer(config, str(tmp_path), log_every=1000)
    assert tr.param_map is not None
    n_state = sum(int(np.prod(l.shape))
                  for l in jax.tree_util.tree_leaves(tr.state.params))
    assert n_state < 0.05 * tr.n_params

    from unidisc_tpu.data.synthetic import SyntheticDataLoader
    out = tr.fit(SyntheticDataLoader(config, batch_size=8), max_steps=3)
    assert out["step"] == 3 and np.isfinite(out["loss"])
    tr.close()
    # every save exports the adapter npz for --lora serving
    import os
    assert os.path.exists(str(tmp_path / "lora_adapter.npz"))


def test_trainer_lora_base_checkpoint_and_engine_ckpt_serve(tmp_path):
    """End-to-end fine-tune contract: train a base run, LoRA-fine-tune
    from it via base_checkpoint, then serve the LoRA run dir through
    build_engine(--ckpt) — the engine must rebuild base + adapter and
    serve the merged weights."""
    from unidisc_tpu.data.synthetic import SyntheticDataLoader
    from unidisc_tpu.serving.engine import build_engine
    from unidisc_tpu.training.trainer import Trainer, restore_base_params

    base_cfg = Config.make("tiny").override(**{
        "trainer.warmup_steps": 1, "trainer.lr": 1e-3})
    base_dir = str(tmp_path / "base")
    tr = Trainer(base_cfg, base_dir, ckpt_every=2, log_every=1000)
    tr.fit(SyntheticDataLoader(base_cfg, batch_size=8), max_steps=2)
    tr.close()

    # LoRA run on top of the base checkpoint (zero_linear_init stays at
    # its default: a TRAINED base head is nonzero, so this must be legal)
    lora_cfg = Config.make("tiny").override(**{
        "model.lora_rank": 2, "model.lora_alpha": 4.0,
        "trainer.warmup_steps": 1, "trainer.lr": 1e-2})
    lora_dir = str(tmp_path / "lora")
    tr2 = Trainer(lora_cfg, lora_dir, ckpt_every=2, log_every=1000,
                  base_checkpoint=base_dir)
    assert tr2._lora_base_checkpoint is not None
    # the frozen base IS the base run's EMA params
    base_ema = restore_base_params(base_dir)
    for p, leaf in traverse_util.flatten_dict(base_ema).items():
        np.testing.assert_array_equal(
            np.asarray(leaf),
            np.asarray(traverse_util.flatten_dict(tr2.base_params)[p]))
    tr2.fit(SyntheticDataLoader(lora_cfg, batch_size=8), max_steps=2)
    expected = merge_lora(
        tr2.base_params, jax.device_get(tr2.state.ema_params),
        alpha=4.0, rank=2)
    tr2.close()

    # serve the LoRA run dir directly: --ckpt <lora run>
    eng = build_engine(preset="tiny", checkpoint=lora_dir, steps=4)
    for p, leaf in traverse_util.flatten_dict(expected).items():
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(traverse_util.flatten_dict(eng.params)[p]),
            rtol=1e-6, atol=1e-7, err_msg=str(p))
    out = eng.run(text="hi", task="gen_image", steps=4, seed=0)
    assert "text" in out


def test_trainer_lora_random_base_warns_not_raises():
    """zero_linear_init=False + random base is a legal smoke-run combo."""
    from unidisc_tpu.training.trainer import Trainer
    mc = small_model_cfg(lora_rank=4, lora_alpha=8.0,
                         zero_linear_init=False)
    tr = Trainer(Config(model=mc), "/tmp/lora_smoke_unused",
                 ckpt_every=0, log_every=1000)
    assert tr.param_map is not None
    tr.close()


def test_elm_engine_serves_lora(tmp_path):
    """build_engine(preset='elm:tiny', lora=...) merges the adapter into
    the ELM weights (the reference's actual LoRA target, qkv_proj) —
    previously the ELM route silently dropped --lora."""
    from unidisc_tpu.serving.engine import build_elm_engine
    eng0 = build_elm_engine(preset="tiny")
    adapter = init_lora(jax.random.PRNGKey(5), eng0.params, rank=2,
                        targets=("qkv_proj",))
    adapter = jax.tree_util.tree_map(lambda l: l + 0.02, adapter)
    path = str(tmp_path / "elm_ad.npz")
    save_lora(path, adapter, alpha=4.0, rank=2)

    eng1 = build_elm_engine(preset="tiny", lora=path)
    f0 = traverse_util.flatten_dict(eng0.params)
    f1 = traverse_util.flatten_dict(eng1.params)
    changed = 0
    for p in f0:
        same = np.array_equal(np.asarray(f0[p]), np.asarray(f1[p]))
        if "qkv_proj" in "/".join(p) and p[-1] == "kernel":
            assert not same, f"adapter target unchanged: {p}"
            changed += 1
        else:
            assert same, f"non-target leaf changed: {p}"
    assert changed > 0
    # int8 quantization sees the merged weights: quantized engines from
    # base vs adapter differ too
    q0 = build_elm_engine(preset="tiny", quantize="int8")
    q1 = build_elm_engine(preset="tiny", quantize="int8", lora=path)
    fq0 = traverse_util.flatten_dict(q0.params)
    fq1 = traverse_util.flatten_dict(q1.params)
    assert any(not np.array_equal(np.asarray(fq0[p]), np.asarray(fq1[p]))
               for p in fq0)


def test_save_load_roundtrip(tmp_path, dit_setup):
    _, model, params = dit_setup
    adapter = init_lora(jax.random.PRNGKey(1), params, rank=4,
                        train_full=("vocab_embed",))
    adapter = jax.tree_util.tree_map(
        lambda l: l + 0.01, adapter)
    path = str(tmp_path / "adapter.npz")
    save_lora(path, adapter, alpha=8.0, rank=4)
    loaded, alpha, rank = load_lora(path)
    assert alpha == 8.0 and rank == 4
    for p, leaf in traverse_util.flatten_dict(adapter).items():
        np.testing.assert_allclose(
            np.asarray(leaf),
            np.asarray(traverse_util.flatten_dict(loaded)[p]), rtol=1e-6)
    # merged forwards identical from saved vs in-memory adapter
    m0 = merge_lora(params, adapter, alpha=8.0, rank=4)
    m1 = merge_lora(params, loaded, alpha=alpha, rank=rank)
    x = jax.random.randint(jax.random.PRNGKey(2), (2, 32), 0, 128)
    sigma = jnp.full((2,), 0.5)
    y0 = model.apply({"params": m0}, x, sigma, deterministic=True)
    y1 = model.apply({"params": m1}, x, sigma, deterministic=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_engine_serves_merged_adapter(tmp_path):
    """build_engine(lora=...) merges a saved adapter into the served
    weights — only target kernels change vs the plain engine."""
    from unidisc_tpu.serving.engine import build_engine
    eng0 = build_engine(preset="tiny", steps=4)
    adapter = init_lora(jax.random.PRNGKey(5), eng0.params, rank=2)
    adapter = jax.tree_util.tree_map(lambda l: l + 0.02, adapter)
    path = str(tmp_path / "ad.npz")
    save_lora(path, adapter, alpha=4.0, rank=2)

    eng1 = build_engine(preset="tiny", steps=4, lora=path)
    f0 = traverse_util.flatten_dict(eng0.params)
    f1 = traverse_util.flatten_dict(eng1.params)
    for p in f0:
        same = np.array_equal(np.asarray(f0[p]), np.asarray(f1[p]))
        if "attn_qkv" in "/".join(p) and p[-1] == "kernel":
            assert not same, f"adapter target unchanged: {p}"
        else:
            assert same, f"non-target leaf changed: {p}"
    out = eng1.run(text="hi", task="gen_image", steps=4, seed=0)
    assert "text" in out


def test_no_match_raises(dit_setup):
    _, _, params = dit_setup
    with pytest.raises(ValueError):
        init_lora(jax.random.PRNGKey(0), params, rank=4,
                  targets=("does_not_exist",))
