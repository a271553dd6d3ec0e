"""LR schedule zoo + muP tests (reference: configs/lr_scheduler/*.yaml,
mup integration model_setup.py:163/416-418)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.training.mup import mup_lr_scale, mup_multiplier
from unidisc_tpu.training.train_state import make_lr_schedule


def _cfg(**kw):
    return Config.make("tiny").override(**kw)


def test_constant_warmup_cosine_decay():
    c = _cfg(**{"trainer.lr_schedule": "constant_warmup_cosine_decay",
                "trainer.lr": 1e-3, "trainer.lr_min": 1e-6,
                "trainer.warmup_steps": 100, "trainer.max_steps": 1000})
    s = make_lr_schedule(c)
    assert float(s(0)) == 0.0
    assert abs(float(s(100)) - 1e-3) < 1e-9
    assert abs(float(s(1000)) - 1e-6) < 1e-8      # decays to the floor
    mid = float(s(550))
    assert 1e-6 < mid < 1e-3


def test_cosine_hard_restarts_matches_hf_formula():
    c = _cfg(**{"trainer.lr_schedule": "cosine_hard_restarts",
                "trainer.lr": 1.0, "trainer.warmup_steps": 10,
                "trainer.max_steps": 110, "trainer.num_cycles": 2})
    s = make_lr_schedule(c)

    def hf(step):
        if step < 10:
            return step / 10
        progress = (step - 10) / 100
        if progress >= 1.0:
            return 0.0
        return max(0.0, 0.5 * (1 + math.cos(math.pi * ((2 * progress) % 1))))

    for step in [0, 5, 10, 35, 59, 60, 61, 85, 109, 110, 150]:
        assert abs(float(s(step)) - hf(step)) < 1e-6, step
    # restart: lr returns to peak at the cycle boundary
    assert float(s(61)) > 0.9


def test_mup_multiplier_rules():
    width, base = 1024, 256
    flat = {
        ("blocks", "attn", "qkv", "kernel"): jnp.zeros((width, 3 * width)),
        ("blocks", "mlp", "fc1", "kernel"): jnp.zeros((width, 4 * width)),
        ("embed", "embedding"): jnp.zeros((48000, width)),
        ("vocab_embed", "kernel"): jnp.zeros((48000, width)),
        ("blocks", "norm", "scale"): jnp.zeros((width,)),
        ("head", "bias"): jnp.zeros((width,)),
    }

    class K:
        def __init__(self, key):
            self.key = key

    for path, p in flat.items():
        mult = mup_multiplier([K(k) for k in path], p,
                              base_width=base, width=width)
        if "embed" in "/".join(path) or p.ndim < 2:
            assert mult == 1.0, path
        else:
            assert mult == base / width, path


def test_mup_scale_in_optimizer_chain():
    c = _cfg(**{"model.mup": True, "model.mup_base_width": 8,
                "model.hidden_size": 32})
    tx = mup_lr_scale(c)
    params = {"dense": {"kernel": jnp.ones((32, 32)),
                        "bias": jnp.ones((32,))}}
    state = tx.init(params)
    updates, _ = tx.update(
        {"dense": {"kernel": jnp.ones((32, 32)),
                   "bias": jnp.ones((32,))}}, state, params)
    np.testing.assert_allclose(updates["dense"]["kernel"], 0.25)
    np.testing.assert_allclose(updates["dense"]["bias"], 1.0)


def test_mup_train_step_runs():
    """A muP-enabled train step runs end-to-end and updates params."""
    from unidisc_tpu.models.dit import DIT
    from unidisc_tpu.training.train_state import (
        init_train_state, make_optimizer)

    c = _cfg(**{"model.mup": True, "model.mup_base_width": 16,
                "trainer.warmup_steps": 0,
                "model.hidden_size": 32, "model.n_heads": 2,
                "model.n_blocks": 2, "model.length": 16,
                "model.txt_length": 8, "model.img_length": 8,
                "model.text_vocab_size": 30, "model.image_vocab_size": 10})
    model = DIT(c.model)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16), jnp.int32)
    sigma = jnp.zeros((2,))
    params = model.init(rng, x, sigma)["params"]
    opt = make_optimizer(c)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    # something moved, and finite
    moved = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, new, params), 0.0)
    assert moved > 0 and np.isfinite(moved)
