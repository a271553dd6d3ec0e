"""Train-step tests: single-device correctness and 8-virtual-device SPMD
(reference behavior: model.py:1304-1670 training loop semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.parallel.mesh import (batch_sharding, make_mesh, param_spec,
                                       params_shardings)
from unidisc_tpu.training.train_state import (init_train_state,
                                              make_eval_step,
                                              make_train_step,
                                              shard_train_step)


def tiny_config(**over):
    cfg = Config.make("tiny")
    cfg = cfg.override(**{
        "model.time_conditioning": True,
        "trainer.warmup_steps": 2,
        "trainer.lr": 1e-3,
        "trainer.ema_decay": 0.9,
        "model.dropout": 0.0,
        **over,
    })
    return cfg


def make_batch(cfg, rng, batch_size=8):
    m = cfg.model
    k1, _ = jax.random.split(rng)
    txt = jax.random.randint(k1, (batch_size, m.txt_length), 0,
                             m.text_vocab_size - 1)
    img = jax.random.randint(k1, (batch_size, m.img_length),
                             m.text_vocab_size, m.vocab_size)
    x0 = jnp.concatenate([txt, img], axis=-1).astype(jnp.int32)
    modality = jnp.concatenate(
        [jnp.zeros((batch_size, m.txt_length), jnp.int32),
         jnp.ones((batch_size, m.img_length), jnp.int32)], axis=-1)
    return {"input_ids": x0, "modality": modality}


def test_train_step_runs_and_learns():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    batch = make_batch(cfg, rng)

    losses = []
    for i in range(15):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics.loss))
    assert np.isfinite(losses).all()
    assert int(state.step) == 15
    # overfitting a fixed batch must reduce the loss (reference smoke test:
    # trainer.overfit_on_first_batch, model.py:800-805)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert float(metrics.grad_norm) > 0


def test_ema_tracks_params():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    batch = make_batch(cfg, rng)
    state2, _ = step_fn(state, batch, jax.random.PRNGKey(1))
    p0 = jax.tree_util.tree_leaves(params)[0]
    p1 = jax.tree_util.tree_leaves(state2.params)[0]
    e1 = jax.tree_util.tree_leaves(state2.ema_params)[0]
    expected = p0 * 0.9 + p1 * 0.1
    np.testing.assert_allclose(np.asarray(e1), np.asarray(expected),
                               rtol=1e-5, atol=1e-6)


def test_param_spec_rule():
    cfg = Config.make("tiny", **{"mesh.fsdp": 8})
    mesh = make_mesh(cfg.mesh)
    # large matrix: largest divisible dim sharded
    spec = param_spec("blocks/mlp_0/kernel", (12, 768, 3072), mesh)
    assert spec == jax.sharding.PartitionSpec(None, None, "fsdp")
    # small param: replicated
    assert param_spec("norm1/weight", (768,), mesh) == \
        jax.sharding.PartitionSpec()
    # embedding: vocab dim sharded
    spec = param_spec("vocab_embed", (48385, 768), mesh)
    assert spec == jax.sharding.PartitionSpec(None, "fsdp")


def test_sharded_train_step_8dev():
    assert len(jax.devices()) == 8
    cfg = tiny_config(**{"mesh.fsdp": 8})
    mesh = make_mesh(cfg.mesh)
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)

    step_fn = make_train_step(cfg, model, mesh=mesh)
    jitted, state, data_sh = shard_train_step(step_fn, state, mesh)

    batch = jax.device_put(make_batch(cfg, rng), data_sh)
    state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))

    # parity: sharded step == single-device step
    model2, params2 = init_dit(jax.random.PRNGKey(0), cfg.model)
    state2 = init_train_state(cfg, params2)
    ref_fn = jax.jit(make_train_step(cfg, model2))
    state2, metrics2 = ref_fn(state2, make_batch(cfg, jax.random.PRNGKey(0)),
                              jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics.loss), float(metrics2.loss),
                               rtol=2e-2)


def test_eval_step():
    cfg = tiny_config()
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    eval_fn = jax.jit(make_eval_step(cfg, model))
    m = eval_fn(state, make_batch(cfg, rng), jax.random.PRNGKey(2))
    assert np.isfinite(float(m.loss))
    assert float(m.token_count) > 0


def test_ar_parameterization():
    cfg = tiny_config(**{"trainer.parameterization": "ar",
                         "model.full_attention": False})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    state, metrics = step_fn(state, make_batch(cfg, rng), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))


def test_sedd_and_d3pm_parameterizations():
    for param in ["sedd", "d3pm"]:
        cfg = tiny_config(**{"trainer.parameterization": param})
        rng = jax.random.PRNGKey(0)
        model, params = init_dit(rng, cfg.model)
        state = init_train_state(cfg, params)
        step_fn = jax.jit(make_train_step(cfg, model))
        state, metrics = step_fn(state, make_batch(cfg, rng),
                                 jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics.loss)), param
        assert float(metrics.grad_norm) > 0, param


def test_grad_accum_microbatching():
    cfg = tiny_config(**{"trainer.grad_accum_steps": 2})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    batch = make_batch(cfg, rng, batch_size=8)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics.loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])  # still learns


def test_tensor_parallel_rules_and_step():
    from unidisc_tpu.parallel.mesh import param_spec
    from jax.sharding import PartitionSpec as P
    cfg = tiny_config(**{"mesh.dcn": 1, "mesh.fsdp": 4, "mesh.tensor": 2})
    mesh = make_mesh(cfg.mesh)
    # column-parallel up-proj: out dim on tensor
    assert param_spec("blocks/attention/attn_qkv/kernel",
                      (2, 128, 384), mesh) == P(None, "fsdp", "tensor")
    # row-parallel down-proj: in dim on tensor
    assert param_spec("blocks/mlp_2/kernel",
                      (2, 512, 128), mesh) == P(None, "tensor", "fsdp")

    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = make_train_step(cfg, model, mesh=mesh)
    jitted, state, data_sh = shard_train_step(step_fn, state, mesh)
    batch = jax.device_put(make_batch(cfg, rng), data_sh)
    state, metrics = jitted(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))


def test_adafactor_and_importance_sampling():
    cfg = tiny_config(**{"trainer.optimizer": "adafactor",
                         "trainer.importance_sampling": True})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    state, metrics = step_fn(state, make_batch(cfg, rng),
                             jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))


def test_ademamix_optimizer():
    # reference: trainer.ademamix -> unidisc/utils/ademamix.py AdEMAMix
    # (model_setup.py:400-403); here optax.contrib.ademamix
    cfg = tiny_config(**{"trainer.optimizer": "ademamix"})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    for i in range(3):
        state, metrics = step_fn(state, make_batch(cfg, rng),
                                 jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics.loss))
    assert int(state.step) == 3


def test_muon_optimizer():
    """trainer.optimizer='muon' (training/muon.py routing over
    optax.contrib.muon — BEYOND the reference zoo): hidden block
    matrices get NS-orthogonalized momentum (scan-stacked kernels
    batch over axis 0), everything else the embedded Adam. Checks the
    routing on a real DIT tree, that steps run finite, and that loss
    decreases on repeated identical batches."""
    from optax.contrib import MuonDimensionNumbers

    from unidisc_tpu.training.muon import muon_dimension_numbers

    cfg = tiny_config(**{"trainer.optimizer": "muon"})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)

    dn = muon_dimension_numbers(params)
    flat = dict(jax.tree_util.tree_flatten_with_path(
        dn, is_leaf=lambda x: x is None or isinstance(
            x, MuonDimensionNumbers))[0])

    def find(substr):
        return [v for path, v in flat.items()
                if substr in "/".join(getattr(s, "key", "")
                                      for s in path)]

    # scan-stacked trunk kernels: batched matrix axes (1, 2)
    qkv = [v for v in find("attn_qkv") if v is not None]
    assert qkv and all(v.reduction_axis == 1 and v.output_axis == 2
                       for v in qkv)
    # embeddings and the vocab head are Adam leaves
    assert all(v is None for v in find("embed"))
    assert all(v is None for v in find("output_layer"))
    # 1D leaves under blocks (biases, norms) are Adam leaves
    assert all(v is None for v in find("bias"))

    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    batch = make_batch(cfg, rng)
    losses = []
    # per-step t/corruption draws make the NELBO noisy (~±0.7 at this
    # size); 50 steps + first/last-10 means give a clean learning signal
    for i in range(50):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        loss = float(metrics.loss)
        assert np.isfinite(loss)
        losses.append(loss)
    assert int(state.step) == 50
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses


def test_sharded_sampling_8dev():
    """Data-parallel sampling over the mesh: the jitted lax.scan sampler
    runs with the batch sharded over (dcn, fsdp) and params replicated/
    FSDP-sharded — the serving-at-scale configuration."""
    from unidisc_tpu.parallel.mesh import batch_sharding, params_shardings
    from unidisc_tpu.sampling.sampler import build_sampler

    cfg = tiny_config(**{"mesh.fsdp": 8, "sampling.steps": 4,
                         "sampling.predictor": "maskgit",
                         "sampling.cfg": 1.5})
    mesh = make_mesh(cfg.mesh)
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    params = jax.device_put(params, params_shardings(params, mesh))

    def fw(p, x, sigma, modality):
        return model.apply({"params": p}, x, sigma, modality=modality)

    sample = jax.jit(build_sampler(fw, cfg))
    m = cfg.model
    B = 16
    batch = make_batch(cfg, jax.random.PRNGKey(1), batch_size=B)
    x0 = jax.device_put(batch["input_ids"], batch_sharding(mesh))
    modality = jax.device_put(batch["modality"], batch_sharding(mesh))
    unmask = jax.device_put(
        jnp.zeros((B, m.length), bool).at[:, :m.txt_length].set(True),
        batch_sharding(mesh))
    out = sample(params, jax.random.PRNGKey(2), x0, unmask, modality)
    tokens = np.asarray(out.tokens)
    assert tokens.shape == (B, m.length)
    assert not (tokens == m.mask_index).any()
    np.testing.assert_array_equal(tokens[:, :m.txt_length],
                                  np.asarray(batch["input_ids"])[:, :m.txt_length])


def test_add_label_training_and_prior():
    """Label-as-token conditioning (reference: trainer.add_label
    model.py:322-334/553-563): the class token occupies position 0 with
    id label + label_shift, is excluded from the loss, never corrupted,
    and first_token_dropout re-masks it for label-CFG."""
    from unidisc_tpu.sampling.extras import class_conditional_prior
    from unidisc_tpu.training.train_state import compute_batch_loss

    n_labels = 10
    cfg = tiny_config(**{"model.add_labels": n_labels,
                         "trainer.add_label": True,
                         "trainer.first_token_dropout": 0.2}).validate()
    m = cfg.model
    assert m.vocab_size == m.text_vocab_size + m.image_vocab_size + n_labels
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    batch = make_batch(cfg, rng, batch_size=4)
    # keep data ids out of the label slice
    batch["input_ids"] = jnp.minimum(batch["input_ids"], m.label_shift - 1)
    batch["label"] = jnp.asarray([0, 3, 7, 9], jnp.int32)

    from unidisc_tpu.training.train_state import make_apply_fn
    apply_fn = make_apply_fn(cfg, model)

    out = jax.jit(lambda r: compute_batch_loss(
        cfg, apply_fn, params, r, batch, train=True))(jax.random.PRNGKey(2))
    assert np.isfinite(float(out.loss))
    # position 0 excluded from the loss
    assert not np.asarray(out.token_mask)[:, 0].any()

    # full train step jits and learns with the label batch
    state = init_train_state(cfg, params)
    step_fn = jax.jit(make_train_step(cfg, model))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics.loss))

    # class-conditional sampling prior
    label = jnp.asarray([1, 5], jnp.int32)
    x0, x0_unmask = class_conditional_prior(label, cfg)
    assert x0.shape == (2, m.length) and x0_unmask.shape == (2, m.length)
    np.testing.assert_array_equal(np.asarray(x0[:, 0]),
                                  np.asarray(label) + m.label_shift)
    assert bool(x0_unmask[:, 0].all()) and not bool(x0_unmask[:, 1:].any())
    assert (np.asarray(x0[:, 1:]) == m.mask_index).all()


def test_add_label_config_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tiny_config(**{"trainer.add_label": True}).validate()
    with _pytest.raises(ValueError):
        tiny_config(**{"model.add_labels": 4,
                       "trainer.add_label": True,
                       "trainer.first_token_dropout": 0.1,
                       "trainer.mask_entire_modality": 0.15}).validate()


def test_remat_policy_loss_identical():
    """model.remat_policy selects WHAT the backward recomputes, never the
    math: loss under remat none/dots/dots_all must match the un-remat step
    exactly (same params/batch/rng)."""
    from unidisc_tpu.training.train_state import compute_batch_loss, \
        make_apply_fn

    losses = {}
    for policy in (None, "none", "dots", "dots_all"):
        over = {} if policy is None else {"model.remat_policy": policy}
        cfg = tiny_config(**over)
        model, params = init_dit(jax.random.PRNGKey(0), cfg.model,
                                 remat=policy is not None)
        apply_fn = make_apply_fn(cfg, model)

        def loss_fn(p):
            return compute_batch_loss(cfg, apply_fn, p,
                                      jax.random.PRNGKey(7),
                                      make_batch(cfg, jax.random.PRNGKey(1),
                                                 batch_size=4),
                                      train=True).loss

        val, grad = jax.jit(jax.value_and_grad(loss_fn))(params)
        leaves = jax.tree_util.tree_leaves(grad)
        gnorm = float(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                          for g in leaves) ** 0.5)
        losses[policy] = (float(val), gnorm)

    base = losses[None]
    for policy in ("none", "dots", "dots_all"):
        np.testing.assert_allclose(losses[policy][0], base[0], rtol=1e-5)
        np.testing.assert_allclose(losses[policy][1], base[1], rtol=1e-4)


def test_img_cond_training_and_sampling():
    """Cross-attention image conditioning (reference model.img_cond,
    models/dit.py:1147-1183/1385-1400 + cond_input_ids plumbing,
    model.py:262-263/399-400): the cond stream reaches the loss through
    batch["x_cond"], gradients flow into the cond trunk, and samplers
    condition through a closed-over x_cond."""
    cfg = tiny_config(**{
        "model.time_conditioning": False,
        "model.img_cond": True,
        "model.cond_image_vocab_size": 24,
        "model.cond_length": 12,
        "model.n_cond_blocks": 2,
        # a zero-init output head gives zero upstream grads at step 1,
        # hiding whether the cond trunk is trainable
        "model.zero_linear_init": False,
    }).validate()
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model))
    batch = dict(make_batch(cfg, rng, batch_size=4))
    batch["x_cond"] = jax.random.randint(
        jax.random.PRNGKey(3), (4, cfg.model.cond_length), 0, 24)

    state1 = state
    for i in range(3):   # warmup_lr_init is 0.0 — step past it
        state1, metrics = step(state1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
    # cond-trunk and cross-attention weights actually move
    import flax
    d0 = flax.traverse_util.flatten_dict(state.params, sep="/")
    d1 = flax.traverse_util.flatten_dict(state1.params, sep="/")
    for key in ("img_cond_blocks/attention/attn_qkv/kernel",
                "blocks/cross_attention/attn_qkv_cond/kernel",
                "cond_img_vocab_embed"):
        assert float(np.abs(np.asarray(d1[key] - d0[key])).max()) > 0, key

    # the conditioning changes the loss (not a dead input)
    from unidisc_tpu.training.train_state import make_eval_step
    ev = jax.jit(make_eval_step(cfg, model, use_ema=False))
    m1 = ev(state1, batch, jax.random.PRNGKey(2))
    batch2 = dict(batch)
    batch2["x_cond"] = (batch["x_cond"] + 7) % 24
    m2 = ev(state1, batch2, jax.random.PRNGKey(2))
    assert abs(float(m1.loss) - float(m2.loss)) > 1e-6

    # sampling: x_cond rides the forward closure; different conditions
    # give different generations at a fixed seed
    from unidisc_tpu.sampling.sampler import build_sampler

    def fwd_with(xc):
        def f(p, x, sigma, modality):
            return model.apply({"params": p}, x, sigma, modality=modality,
                               x_cond=xc)
        return f

    cfg_s = cfg.override(**{"sampling.predictor": "maskgit",
                            "sampling.steps": 4, "sampling.cfg": None})
    B, L = 2, cfg.model.length
    x0 = jnp.zeros((B, L), jnp.int32)
    unmask = jnp.zeros((B, L), bool)
    modality = jnp.concatenate(
        [jnp.zeros((B, cfg.model.txt_length), jnp.int32),
         jnp.ones((B, cfg.model.img_length), jnp.int32)], axis=-1)
    xc1 = batch["x_cond"][:B]
    xc2 = batch2["x_cond"][:B]
    out1 = jax.jit(build_sampler(fwd_with(xc1), cfg_s))(
        state1.params, jax.random.PRNGKey(5), x0, unmask, modality)
    out2 = jax.jit(build_sampler(fwd_with(xc2), cfg_s))(
        state1.params, jax.random.PRNGKey(5), x0, unmask, modality)
    assert out1.tokens.shape == (B, L)
    assert int((out1.tokens != cfg.model.mask_index).sum()) == B * L
    assert int((out1.tokens != out2.tokens).sum()) > 0


def test_scale_lr_by_batch_size():
    """trainer.scale_lr_by_batch_size (reference main.py:320-322):
    lr *= global_batch_size / 512."""
    from unidisc_tpu.training.train_state import make_lr_schedule
    cfg = tiny_config(**{"trainer.warmup_steps": 0,
                         "trainer.lr": 1e-3,
                         "trainer.global_batch_size": 128,
                         "trainer.scale_lr_by_batch_size": True})
    sched = make_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(1)), 1e-3 * 128 / 512,
                               rtol=1e-6)
    base = make_lr_schedule(tiny_config(**{"trainer.warmup_steps": 0,
                                           "trainer.lr": 1e-3}))
    np.testing.assert_allclose(float(base(1)), 1e-3, rtol=1e-6)


def test_low_precision_params():
    """trainer.low_precision_params (reference model_setup.py:119/294):
    bf16 parameters/optimizer state; the step still runs with a finite
    loss. The EMA deliberately stays fp32 (init_train_state): at decay
    0.9999 the (1-decay) increment is below bf16's ulp, so a bf16 EMA
    would round back to itself every step and never leave init."""
    cfg = tiny_config(**{"trainer.low_precision_params": True})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_train_state(cfg, params)
    leaves = [p for p in jax.tree_util.tree_leaves(state.params)
              if hasattr(p, "dtype")]
    assert all(p.dtype == jnp.bfloat16 for p in leaves)
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state.ema_params)
               if jnp.issubdtype(p.dtype, jnp.floating))
    step = jax.jit(make_train_step(cfg, model))
    state2, metrics = step(state, make_batch(cfg, rng, 4),
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
    assert jax.tree_util.tree_leaves(state2.params)[0].dtype == jnp.bfloat16


def test_offload_fused_update_matches_optax():
    """The offload step's hand-fused flat optimizer update must match
    optax element-for-element — adamw and lion, across several steps
    with schedule + weight decay active."""
    import optax

    from unidisc_tpu.training.offload import _fused_update
    for opt_name in ("adamw", "lion"):
        cfg = tiny_config(**{"trainer.optimizer": opt_name,
                             "trainer.warmup_steps": 2,
                             "trainer.lr": 3e-3,
                             "trainer.weight_decay": 0.01})
        t = cfg.trainer
        from unidisc_tpu.training.train_state import make_lr_schedule
        sched = make_lr_schedule(cfg)
        if opt_name == "adamw":
            opt = optax.adamw(sched, b1=t.beta1, b2=t.beta2, eps=t.opt_eps,
                              weight_decay=t.weight_decay)
        else:
            opt = optax.lion(sched, b1=t.beta1, b2=t.beta2,
                             weight_decay=t.weight_decay)
        rng = jax.random.PRNGKey(0)
        m = jax.random.normal(rng, (513,), jnp.float32)
        opt_state = opt.init(m)
        mu = jnp.zeros_like(m)
        nu = jnp.zeros_like(m)
        for step in range(4):
            g = jax.random.normal(jax.random.fold_in(rng, step), (513,))
            updates, opt_state = opt.update(g, opt_state, m)
            m_ref = optax.apply_updates(m, updates)
            m, mu, nu = _fused_update(cfg, m, mu, nu, g,
                                      jnp.int32(step))
            np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                       rtol=1e-6, atol=1e-7)
            m = m_ref  # keep trajectories pinned together


def test_offload_flat_roundtrip():
    """tree -> [K,C] rows -> tree is an exact round trip (incl. the
    zero-padded tail) and chunk_row agrees with the packed rows."""
    from unidisc_tpu.training.offload import (chunk_row, make_flat_spec,
                                              rows_to_tree, tree_to_rows)
    cfg = tiny_config()
    _, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    spec = make_flat_spec(params, 3)
    rows = tree_to_rows(params, spec, jnp.float32)
    assert rows.shape == (3, spec.chunk_size)
    back = rows_to_tree(rows, spec, jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(chunk_row(params, spec, k, jnp.float32)),
            np.asarray(rows[k]))


def test_offload_train_step_math_cpu():
    """Host-offloaded fp32-master training (training/offload.py), math
    path (annotate=False — the pinned_host placements need a TPU
    runtime, measured in scripts/bench_offload.py): bf16 working
    weights + fp32 master/moments/EMA, loss learns, the working weights
    are exactly bf16(master), chunked (K=4) and unchunked trajectories
    agree, and the non-finite guard skips updates."""
    from unidisc_tpu.training.offload import (gather_ema, gather_master,
                                              init_offload_state,
                                              make_offload_train_step)
    cfg = tiny_config(**{"trainer.warmup_steps": 0, "trainer.lr": 2e-3})
    rng = jax.random.PRNGKey(0)
    model, params = init_dit(rng, cfg.model)
    state = init_offload_state(cfg, params, annotate=False, chunks=1)
    state4 = init_offload_state(cfg, params, annotate=False, chunks=4)
    assert len(state4.masters) == 4 and len(state.masters) == 1
    step = make_offload_train_step(cfg, model, annotate=False)
    batch = make_batch(cfg, rng, batch_size=8)

    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        state4, metrics4 = step(state4, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics.loss))
        np.testing.assert_allclose(float(metrics4.loss), losses[-1],
                                   rtol=1e-6)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])

    # chunked == unchunked: same math, different staging — identical up
    # to fp32 fusion/FMA rounding (different chunk sizes compile
    # different executables)
    m1 = gather_master(state)
    m4 = gather_master(state4)
    for a, b in zip(jax.tree_util.tree_leaves(m1),
                    jax.tree_util.tree_leaves(m4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-7)

    leaves_w = jax.tree_util.tree_leaves(state.params)
    leaves_m = jax.tree_util.tree_leaves(m1)
    assert all(w.dtype == jnp.bfloat16 for w in leaves_w)
    assert all(m.dtype == jnp.float32 for m in leaves_m)
    for w, m in zip(leaves_w, leaves_m):
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(m.astype(jnp.bfloat16)))
    # EMA is a convex combination, not a copy
    e0 = jax.tree_util.tree_leaves(gather_ema(state))[0]
    mm0 = leaves_m[0]
    assert float(np.abs(np.asarray(e0 - mm0)).max()) > 0

    # fp32 master keeps moving step to step
    m_before = np.asarray(leaves_m[0])
    state2, _ = step(state, batch, jax.random.PRNGKey(2))
    m_after = np.asarray(jax.tree_util.tree_leaves(
        gather_master(state2))[0])
    assert np.abs(m_after - m_before).max() > 0

    # NaN guard: poison the WORKING weights -> NaN loss -> master and
    # moments must stay bit-equal, and the returned working weights are
    # re-derived from the untouched master (self-repair)
    poisoned = state2.replace(params=jax.tree_util.tree_map(
        lambda w: (w * jnp.nan).astype(w.dtype)
        if jnp.issubdtype(w.dtype, jnp.floating) else w, state2.params))
    state3, metrics3 = step(poisoned, batch, jax.random.PRNGKey(3))
    assert not np.isfinite(float(metrics3.loss))
    for a, b in zip(state3.masters + state3.mus + state3.nus + state3.emas,
                    state2.masters + state2.mus + state2.nus + state2.emas):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for w, m in zip(jax.tree_util.tree_leaves(state3.params),
                    jax.tree_util.tree_leaves(gather_master(state3))):
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(m.astype(jnp.bfloat16)))
    # opt_count semantics (resident-path parity): step counts ATTEMPTS,
    # opt_count counts APPLIED updates — the NaN step advances step but
    # not opt_count, so lr/bias-correction stay aligned with optax's
    # restored count; the next good step advances both again
    assert int(state3.step) == int(state2.step) + 1
    assert int(state3.opt_count) == int(state2.opt_count)
    assert int(state2.opt_count) == int(state2.step)  # all prior steps ok
    state5, metrics5 = step(state3, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics5.loss))
    assert int(state5.opt_count) == int(state3.opt_count) + 1
