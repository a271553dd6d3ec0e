"""Trainer shell tests: checkpoint roundtrip/resume, loop smoke, data layer
(reference behaviors: model_setup.py:899-1004 ckpt hooks; main.py:470-539
resume; unidisc/datasets/sampler.py state)."""

import json
import os

import jax
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.data.synthetic import SyntheticDataLoader
from unidisc_tpu.data.token_shards import (TokenShardDataset,
                                           WeightedDatasetSampler,
                                           write_shard)
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.training.checkpoint import CheckpointManager
from unidisc_tpu.training.train_state import init_train_state
from unidisc_tpu.training.trainer import Trainer


def tiny_config():
    return Config.make("tiny").override(**{
        "model.time_conditioning": True,
        "model.dropout": 0.0,
        "trainer.warmup_steps": 2,
        "trainer.lr": 1e-3,
    })


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config()
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(cfg, params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_interval_steps=1)
    assert mgr.latest_step() is None
    mgr.save(5, state, cfg, extra={"loader": {"step": 17, "seed": 0}})
    mgr.wait()
    assert mgr.latest_step() == 5

    restored, meta = mgr.restore(state)
    assert meta["loader"]["step"] == 17
    assert meta["config"]["model"]["hidden_size"] == cfg.model.hidden_size
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_checkpoint_retention(tmp_path):
    cfg = tiny_config()
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(cfg, params)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2,
                            save_interval_steps=1)
    for s in [1, 2, 3, 4]:
        mgr.save(s, state, cfg)
    mgr.wait()
    assert mgr.latest_step() == 4
    assert len(list(mgr.all_steps())) <= 2
    mgr.close()


def test_trainer_fit_and_resume(tmp_path):
    cfg = tiny_config()
    run_dir = str(tmp_path / "run")

    tr = Trainer(cfg, run_dir, log_every=5, ckpt_every=10)
    loader = SyntheticDataLoader(cfg, batch_size=8)
    out = tr.fit(loader, max_steps=10)
    assert out["step"] == 10
    assert np.isfinite(out["loss"])
    assert os.path.exists(f"{run_dir}/metrics.jsonl")
    with open(f"{run_dir}/metrics.jsonl") as f:
        records = [json.loads(l) for l in f]
    assert any("bpd" in r for r in records)
    tr.close()

    # resume continues from step 10 and restores loader position
    tr2 = Trainer(cfg, run_dir, log_every=5, ckpt_every=10)
    loader2 = SyntheticDataLoader(cfg, batch_size=8)
    out2 = tr2.fit(loader2, max_steps=15)
    assert out2["step"] == 15
    assert loader2.step >= 10  # loader state restored, not restarted
    tr2.close()


def test_validate(tmp_path):
    cfg = tiny_config()
    tr = Trainer(cfg, str(tmp_path / "run"), ckpt_every=0)
    val = SyntheticDataLoader(cfg, batch_size=8, seed=9)
    out = tr.validate(val, step=0, max_batches=2)
    assert np.isfinite(out["val/bpd"])
    assert "val/img_bpd" in out and "val/txt_ppl" in out
    tr.close()


def test_token_shards_and_weighted_sampler(tmp_path):
    rng = np.random.RandomState(0)
    d1 = str(tmp_path / "s1")
    d2 = str(tmp_path / "s2")
    write_shard(d1, rng.randint(0, 100, (64, 48)).astype(np.int32),
                np.concatenate([np.zeros((64, 16)), np.ones((64, 32))],
                               1).astype(np.int8), name="a")
    write_shard(d2, rng.randint(0, 100, (32, 48)).astype(np.int32))

    ds1, ds2 = TokenShardDataset(d1), TokenShardDataset(d2)
    assert len(ds1) == 64 and len(ds2) == 32
    b = ds1.get(np.asarray([0, 5]))
    assert b["input_ids"].shape == (2, 48)
    assert b["modality"].shape == (2, 48)

    sampler = WeightedDatasetSampler([ds1, ds2], [0.7, 0.3], batch_size=4,
                                     seed=1)
    batches = [next(sampler) for _ in range(20)]
    seen = {b["dataset_idx"] for b in batches}
    assert seen == {0, 1}

    # state_dict resume reproduces the exact stream
    state = sampler.state_dict()
    expected = [next(sampler) for _ in range(5)]
    sampler2 = WeightedDatasetSampler([ds1, ds2], [0.7, 0.3], batch_size=4,
                                      seed=1)
    sampler2.load_state_dict(state)
    got = [next(sampler2) for _ in range(5)]
    for e, g in zip(expected, got):
        np.testing.assert_array_equal(e["input_ids"], g["input_ids"])
        assert e["dataset_idx"] == g["dataset_idx"]


def test_resume_completed_run_is_noop(tmp_path):
    """Resuming a run that already reached max_steps must exit cleanly
    (the final checkpoint re-save is a no-op, not a
    StepAlreadyExistsError — surfaced by the round-2 soak)."""
    cfg = tiny_config()
    run_dir = str(tmp_path / "run")
    t1 = Trainer(cfg, run_dir, ckpt_every=2)
    loader = SyntheticDataLoader(cfg, batch_size=8)
    t1.fit(loader, max_steps=4)
    t1.close()
    step1 = 4
    # second trainer restores at max_steps and should fall straight
    # through fit() without raising (its final save is a no-op)
    t2 = Trainer(cfg, run_dir, ckpt_every=2)
    out = t2.fit(SyntheticDataLoader(cfg, batch_size=8), max_steps=4)
    t2.close()
    assert out["step"] == step1


def test_trainer_host_offload_fit_resume_validate(tmp_path):
    """Trainer wiring for host-offloaded fp32-master training
    (trainer.host_offload_optimizer, training/offload.py): single-device
    mode — fit runs the chunked offload step (annotate=False on the CPU
    backend; the pinned_host placement itself is TPU-probed in
    scripts/bench_offload.py), loss learns, working weights are bf16,
    checkpoints round-trip the chunked state (incl. the '@lo:hi'
    layer-split keys through orbax), and validation evaluates the live
    bf16 weights."""
    from unidisc_tpu.parallel.mesh import make_mesh
    from unidisc_tpu.training.offload import OffloadTrainState, gather_master

    cfg = tiny_config().override(**{
        "trainer.host_offload_optimizer": True,
        "trainer.host_offload_chunks": 3,
        "trainer.warmup_steps": 0,
    }).validate()
    mesh1 = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    run_dir = str(tmp_path / "run")

    tr = Trainer(cfg, run_dir, mesh=mesh1, log_every=5, ckpt_every=5,
                 val_use_ema=False)
    assert isinstance(tr.state, OffloadTrainState)
    assert len(tr.state.masters) == 3
    loader = SyntheticDataLoader(cfg, batch_size=8)
    out = tr.fit(loader, max_steps=10)
    assert out["step"] == 10 and np.isfinite(out["loss"])
    leaves_w = jax.tree_util.tree_leaves(tr.state.params)
    assert all(w.dtype == "bfloat16" for w in leaves_w)
    master_after_10 = jax.device_get(gather_master(tr.state))
    val = tr.validate(SyntheticDataLoader(cfg, batch_size=8, seed=9),
                      step=10, max_batches=2)
    assert np.isfinite(val["val/bpd"])
    tr.close()

    # resume: restored masters bit-match the saved run, training continues
    tr2 = Trainer(cfg, run_dir, mesh=mesh1, log_every=5, ckpt_every=5,
                  val_use_ema=False)
    start = tr2.maybe_restore()
    assert start == 10
    for a, b in zip(jax.tree_util.tree_leaves(gather_master(tr2.state)),
                    jax.tree_util.tree_leaves(master_after_10)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out2 = tr2.fit(SyntheticDataLoader(cfg, batch_size=8), max_steps=14)
    assert out2["step"] == 14 and np.isfinite(out2["loss"])
    tr2.close()


def test_host_offload_config_validation():
    base = {"trainer.host_offload_optimizer": True}
    for bad in ({"model.mup": True},
                {"trainer.grad_accum_steps": 2},
                {"model.lora_rank": 4},
                {"trainer.low_precision_params": True}):
        cfg = tiny_config().override(**base, **bad)
        with pytest.raises(ValueError):
            cfg.validate()
    tiny_config().override(**base).validate()


def test_engine_serves_host_offload_run_dir(tmp_path):
    """build_engine(--ckpt <host-offload run>) must detect the chunked
    offload state via the config snapshot, restore it, and serve the
    gathered EMA weights — the analog of the LoRA run-dir restore path
    (round-3 ADVICE)."""
    from unidisc_tpu.parallel.mesh import make_mesh
    from unidisc_tpu.serving.engine import build_engine
    from unidisc_tpu.training.offload import gather_ema

    cfg = tiny_config().override(**{
        "trainer.host_offload_optimizer": True,
        "trainer.host_offload_chunks": 2,
        "trainer.warmup_steps": 0,
    }).validate()
    mesh1 = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    run_dir = str(tmp_path / "run")
    tr = Trainer(cfg, run_dir, mesh=mesh1, ckpt_every=2, log_every=1000,
                 val_use_ema=False)
    tr.fit(SyntheticDataLoader(cfg, batch_size=8), max_steps=4)
    expected = jax.device_get(gather_ema(tr.state))
    tr.close()

    eng = build_engine(preset="tiny", checkpoint=run_dir, steps=4)
    from flax import traverse_util
    got = traverse_util.flatten_dict(jax.device_get(eng.params))
    for p, leaf in traverse_util.flatten_dict(expected).items():
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(got[p]),
                                   rtol=1e-6, atol=1e-7, err_msg=str(p))
    out = eng.run(text="hi", task="gen_image", steps=4, seed=0)
    assert "text" in out
