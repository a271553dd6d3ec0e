"""MoE MLP + expert parallelism (models/moe.py — BEYOND the reference,
which has no MoE; SURVEY §2.6 lists EP as absent there).

Covers: exact top-1 routing semantics vs a manual per-token expert MLP,
capacity-overflow fall-through (dropped tokens contribute exactly zero),
the Switch balance auxiliary discriminating skewed routers, and train-step
loss parity between a pure-FSDP mesh and an (fsdp x ep) expert-parallel
mesh — identical math, different collectives."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.models.moe import MoEMLP
from unidisc_tpu.parallel.mesh import make_mesh, params_shardings
from unidisc_tpu.training.train_state import (init_train_state,
                                              make_train_step,
                                              shard_train_step)

B = 8


def _moe_model_cfg(**over):
    base = {"model.moe_experts": 4, "model.dropout": 0.0}
    base.update(over)
    return Config.make("tiny", **base).model


def test_moe_top1_matches_manual_expert_mlp():
    """With top-1 routing and ample capacity, every token's output IS its
    routed expert's MLP output (gate normalizes to exactly 1)."""
    cfg = _moe_model_cfg(**{"model.moe_top_k": 1,
                            "model.moe_capacity_factor": 8.0})
    mod = MoEMLP(cfg, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    y, aux = mod.apply({"params": params}, x)
    assert np.isfinite(float(aux))

    xr = np.asarray(x.reshape(-1, cfg.hidden_size), np.float32)
    logits = xr @ np.asarray(params["router"]["kernel"])
    routed = logits.argmax(-1)
    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    want = np.empty_like(xr)
    for i, e in enumerate(routed):
        h = jax.nn.gelu(xr[i] @ w1[e] + b1[e, 0], approximate=True)
        want[i] = np.asarray(h @ w2[e] + b2[e, 0])
    got = np.asarray(y).reshape(-1, cfg.hidden_size)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_moe_capacity_overflow_falls_through_to_zero():
    """A zero-weight router ties every token onto expert 0 (top_k picks the
    lowest index); with capacity 8 of 32 tokens, slots fill in token order
    and overflow tokens contribute exactly zero to the MLP branch."""
    cfg = _moe_model_cfg(**{"model.moe_top_k": 1,
                            "model.moe_capacity_factor": 1.0})
    mod = MoEMLP(cfg, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, cfg.hidden_size))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    y, _ = mod.apply({"params": params}, x)
    y = np.asarray(y)[0]
    cap = 32 // cfg.moe_experts
    assert np.abs(y[:cap]).max() > 0
    np.testing.assert_array_equal(y[cap:], np.zeros_like(y[cap:]))


def test_moe_aux_flags_skewed_routing():
    """Switch balance loss: ~1 for a uniform router, -> E when one expert
    absorbs all probability mass."""
    cfg = _moe_model_cfg(**{"model.moe_top_k": 2})
    mod = MoEMLP(cfg, compute_dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.hidden_size))
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    _, aux_uniform = mod.apply({"params": params}, x)
    np.testing.assert_allclose(float(aux_uniform), 1.0, atol=1e-5)

    # a bias-free linear router needs positive inputs for the skewed
    # column to dominate with one sign for every token
    skew = jnp.zeros_like(params["router"]["kernel"]).at[:, 0].set(100.0)
    params["router"]["kernel"] = skew
    _, aux_skew = mod.apply({"params": params}, jnp.abs(x) + 0.1)
    assert float(aux_skew) > 3.5  # ~E = 4


def _train_cfg(**mesh_over):
    return Config.make("tiny").override(**{
        "model.dropout": 0.0,
        "model.time_conditioning": True,
        "model.moe_experts": 4,
        "model.moe_top_k": 2,
        "trainer.softmin_snr": 5.0,
        **mesh_over}).validate()


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


def test_moe_train_step_ep_parity():
    """The (fsdp2 x ep4) expert-parallel train step computes the same loss
    trajectory as pure FSDP — expert sharding only changes collectives —
    and the expert weights actually carry the 'ep' axis in their spec."""
    losses = {}
    for name, mesh_over in (
            ("dp", {"mesh.fsdp": 8}),
            ("ep", {"mesh.fsdp": 2, "mesh.ep": 4})):
        cfg = _train_cfg(**mesh_over)
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:8])
        model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
        if name == "ep":
            spec = params_shardings(params, mesh)["blocks"]["moe"]["w1"].spec
            assert "ep" in spec, spec
        state = init_train_state(cfg, params)
        step = make_train_step(cfg, model, mesh=mesh)
        jitted, state, data_sh = shard_train_step(step, state, mesh)
        batch = jax.device_put(_batch(cfg), data_sh)
        ls = []
        for _ in range(2):
            state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
            ls.append(float(metrics.loss))
        losses[name] = ls
    assert np.isfinite(losses["ep"]).all()
    np.testing.assert_allclose(losses["ep"], losses["dp"], rtol=5e-3)
    assert abs(losses["ep"][1] - losses["ep"][0]) > 1e-6


def test_moe_model_samples():
    """A MoE DIT runs the full jitted maskgit sampler — the inference
    forward (no return_moe_aux) returns plain logits and the per-layer
    scan aux unpacking stays internal."""
    from unidisc_tpu.sampling.sampler import build_sampler

    cfg = Config.make("tiny").override(**{
        "model.dropout": 0.0,
        "model.time_conditioning": True,
        "model.moe_experts": 4,
        "model.moe_top_k": 2,
        "sampling.steps": 4,
        "sampling.predictor": "maskgit"}).validate()
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)

    def fw(p, x, sigma, modality):
        return model.apply({"params": p}, x, sigma, modality=modality)

    sample = jax.jit(build_sampler(fw, cfg))
    b = 2
    batch = _batch(cfg)
    x0 = batch["input_ids"][:b]
    modality = batch["modality"][:b]
    unmask = jnp.zeros((b, m.length), bool).at[:, :m.txt_length].set(True)
    out = sample(params, jax.random.PRNGKey(2), x0, unmask, modality)
    tokens = np.asarray(out.tokens)
    assert tokens.shape == (b, m.length)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :m.txt_length],
                                  np.asarray(x0)[:, :m.txt_length])


def test_moe_validate_rules():
    import pytest
    with pytest.raises(ValueError, match="moe_experts"):
        Config.make("tiny", **{"mesh.ep": 2}).validate()
    with pytest.raises(ValueError, match="divisible"):
        Config.make("tiny", **{"model.moe_experts": 3,
                               "mesh.ep": 2}).validate()
