"""Scaffold decoding (per-step model-size scheduling, scripts/
scaffold_ab.py): a single forward closure dispatches between two trunks
with lax.cond on sigma inside the UNCHANGED scan sampler. The split
boundaries must degenerate exactly: split=0 == big-only sampling,
split=steps == small-only sampling; interior splits must be valid
samples of the shared task."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.sampler import build_sampler

TXT, IMG = 8, 16
STEPS = 6


def _cfg(hidden, blocks):
    return Config.make("tiny").override(**{
        "model.length": TXT + IMG, "model.txt_length": TXT,
        "model.img_length": IMG, "model.text_vocab_size": 13,
        "model.image_vocab_size": 16, "model.hidden_size": hidden,
        "model.n_blocks": blocks, "model.n_heads": 2,
        "model.dropout": 0.0, "model.force_argmax_valid_indices": True,
        "sampling.predictor": "maskgit", "sampling.cfg": None,
        "sampling.steps": STEPS})


def _scaffold_forward(fwd_s, fwd_b, sig_boundary):
    def forward(params, x, sigma, mod):
        ps, pb = params
        return jax.lax.cond(sigma[0] > sig_boundary + 1e-8,
                            lambda _: fwd_s(ps, x, sigma, mod),
                            lambda _: fwd_b(pb, x, sigma, mod), None)
    return forward


def test_scaffold_split_boundaries_degenerate_exactly():
    cfg_s, cfg_b = _cfg(32, 2), _cfg(64, 3)
    model_s, params_s = init_dit(jax.random.PRNGKey(0), cfg_s.model)
    model_b, params_b = init_dit(jax.random.PRNGKey(1), cfg_b.model)
    # perturb so generations differ between models
    params_b = jax.tree_util.tree_map(lambda p: p + 0.1, params_b)

    def fwd(model):
        return lambda p, x, s, m: model.apply({"params": p}, x, s,
                                              modality=m)
    fwd_s, fwd_b = fwd(model_s), fwd(model_b)

    noise = get_noise(cfg_b.noise)
    timesteps = np.linspace(1.0, cfg_b.sampling.sampling_eps, STEPS + 1)

    B = 2
    x0 = np.zeros((B, TXT + IMG), np.int32)
    x0[:, :TXT] = 3
    unmask = np.zeros((B, TXT + IMG), bool)
    unmask[:, :TXT] = True
    modality = np.concatenate([np.zeros((B, TXT), np.int32),
                               np.ones((B, IMG), np.int32)], -1)
    a = (jnp.asarray(x0), jnp.asarray(unmask), jnp.asarray(modality))

    def run(split):
        t_b = timesteps[split] if split < STEPS else -1.0
        sig_b = float(np.asarray(noise.total(jnp.asarray(
            max(t_b, 1e-6)))))
        sample = jax.jit(build_sampler(
            _scaffold_forward(fwd_s, fwd_b, sig_b), cfg_b))
        return np.asarray(sample((params_s, params_b),
                                 jax.random.PRNGKey(7), *a).tokens)

    def run_single(model, params, cfg):
        sample = jax.jit(build_sampler(fwd(model), cfg))
        return np.asarray(sample(params, jax.random.PRNGKey(7),
                                 *a).tokens)

    # boundaries: all-big / all-small reproduce single-model sampling
    np.testing.assert_array_equal(run(0),
                                  run_single(model_b, params_b, cfg_b))
    np.testing.assert_array_equal(run(STEPS),
                                  run_single(model_s, params_s, cfg_s))
    # interior split: valid tokens in the image vocab, prompt clamped
    mid = run(STEPS // 2)
    assert (mid[:, :TXT] == x0[:, :TXT]).all()
    assert (mid[:, TXT:] >= 13).all() and (mid[:, TXT:] < 29).all()
