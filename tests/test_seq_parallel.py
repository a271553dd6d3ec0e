"""Sequence-parallel train step: a mesh with a 'seq' axis shards
activations over L and runs attention as the exact ppermute ring
(parallel/seq_parallel.py gating models/dit.py) — the loss must match
the non-seq-parallel step on the same data."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.parallel.mesh import batch_sharding, make_mesh
from unidisc_tpu.training.train_state import (init_train_state,
                                              make_train_step,
                                              shard_train_step)

B = 8


def _cfg(**mesh_over):
    return Config.make("tiny").override(**{
        "model.dropout": 0.0,
        "model.time_conditioning": True,
        "trainer.softmin_snr": 5.0,
        **mesh_over})


def _batch(cfg):
    m = cfg.model
    rng = np.random.RandomState(0)
    toks = np.concatenate([
        rng.randint(0, m.text_vocab_size - 1, (B, m.txt_length)),
        rng.randint(m.text_vocab_size, m.vocab_size, (B, m.img_length))],
        axis=-1).astype(np.int32)
    modality = np.concatenate([
        np.zeros((B, m.txt_length), np.int32),
        np.ones((B, m.img_length), np.int32)], axis=-1)
    return {"input_ids": jnp.asarray(toks),
            "modality": jnp.asarray(modality)}


def _run(cfg):
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(cfg, params)
    step = make_train_step(cfg, model, mesh=mesh)
    jitted, state, data_sh = shard_train_step(step, state, mesh)
    batch = jax.device_put(_batch(cfg), data_sh)
    state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    return float(metrics.loss), state


def test_seq_parallel_loss_matches_data_parallel():
    loss_dp, _ = _run(_cfg(**{"mesh.dcn": 1, "mesh.fsdp": 8,
                              "mesh.tensor": 1, "mesh.seq": 1}))
    loss_sp, _ = _run(_cfg(**{"mesh.dcn": 1, "mesh.fsdp": 2,
                              "mesh.tensor": 1, "mesh.seq": 4}))
    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-3)


def test_seq_parallel_params_update_consistently():
    """Two steps under seq parallelism keep params in sync with the
    data-parallel run (ring attention gradients flow correctly through
    the full model)."""
    cfg_dp = _cfg(**{"mesh.dcn": 1, "mesh.fsdp": 8, "mesh.tensor": 1,
                     "mesh.seq": 1})
    cfg_sp = _cfg(**{"mesh.dcn": 1, "mesh.fsdp": 2, "mesh.tensor": 1,
                     "mesh.seq": 4})

    losses = {}
    for name, cfg in (("dp", cfg_dp), ("sp", cfg_sp)):
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
        model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, mesh=mesh)
        jitted, state, data_sh = shard_train_step(step, state, mesh)
        batch = jax.device_put(_batch(cfg), data_sh)
        ls = []
        for i in range(2):
            state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
            ls.append(float(metrics.loss))
        losses[name] = ls
    np.testing.assert_allclose(losses["sp"], losses["dp"], rtol=5e-3)
    # the second-step loss must differ from the first (params updated)
    assert abs(losses["sp"][1] - losses["sp"][0]) > 1e-6
