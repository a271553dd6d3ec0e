"""SPMD serving (parallel/sample.py): the diffusion samplers must produce
the SAME tokens on a multi-chip mesh — data-parallel, fsdp-sharded
weights, pipeline-parallel trunk, and their compositions — as on one
device. Runs on the 8-virtual-CPU mesh (conftest).

No reference counterpart: demo/server.py serves one GPU; multi-chip
serving is TPU-native scale-out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.parallel.sample import (batch_multiple, shard_params,
                                         spmd_sampler, validate_mesh)

B, TXT, IMG = 8, 8, 16
L = TXT + IMG


def cfg(**over):
    return Config.make("tiny").override(**{
        "model.length": L, "model.txt_length": TXT, "model.img_length": IMG,
        "model.text_vocab_size": 24, "model.image_vocab_size": 40,
        "model.n_blocks": 4, "model.dropout": 0.0,
        "model.zero_linear_init": False,
        "model.force_argmax_valid_indices": True,
        "sampling.predictor": "maskgit", "sampling.steps": 6,
        "mesh.pp_microbatches": 2, **over})


def mesh_of(**axes):
    names = ("dcn", "fsdp", "tensor", "seq", "pp")
    shape = tuple(axes.get(n, 1) for n in names)
    n = int(np.prod(shape))
    devs = np.asarray(jax.devices()[:n]).reshape(shape)
    return Mesh(devs, names)


def _single_device_tokens(config, model, params, txt):
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    sample = jax.jit(build_t2i_sampler(model, config))
    out = sample(params, jax.random.PRNGKey(7), txt)
    return np.asarray(out.tokens)


@pytest.fixture(scope="module")
def setup():
    config = cfg()
    model, params = init_dit(jax.random.PRNGKey(0), config.model)
    rng = np.random.RandomState(1)
    txt = jnp.asarray(rng.randint(1, 20, (B, TXT)), jnp.int32)
    ref = _single_device_tokens(config, model, params, txt)
    return config, model, params, txt, ref


@pytest.mark.parametrize("axes", [
    dict(fsdp=4),                 # dp + fsdp-sharded weights
    dict(pp=4),                   # pure pipeline
    dict(fsdp=2, pp=2),           # dp x pipeline
    dict(fsdp=2, tensor=2),       # dp x megatron tensor
])
def test_t2i_sampler_matches_single_device(setup, axes):
    config, model, params, txt, ref = setup
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    mesh = mesh_of(**axes)
    sp = shard_params(params, mesh)
    sample = spmd_sampler(build_t2i_sampler(model, config), config, mesh)
    out = sample(sp, jax.random.PRNGKey(7), txt)
    np.testing.assert_array_equal(np.asarray(out.tokens), ref,
                                  err_msg=f"axes={axes}")


def test_generic_sampler_infill_matches(setup):
    """The generic (infill) sampler under fsdp2 x pp2: conditioning rows
    (x0/unmask/modality) ride the data axes; tokens must match."""
    config, model, params, txt, _ = setup
    from unidisc_tpu.sampling.sampler import build_sampler

    def fwd(p, x, sigma, m):
        return model.apply({"params": p}, x, sigma, modality=m)

    rng = np.random.RandomState(3)
    x0 = np.zeros((B, L), np.int32)
    x0[:, :TXT] = np.asarray(txt)
    unmask = np.zeros((B, L), bool)
    unmask[:, :TXT] = True
    modality = np.concatenate([np.zeros((B, TXT), np.int32),
                               np.ones((B, IMG), np.int32)], -1)
    args = (jnp.asarray(x0), jnp.asarray(unmask), jnp.asarray(modality))

    ref = np.asarray(jax.jit(build_sampler(fwd, config))(
        params, jax.random.PRNGKey(11), *args).tokens)

    mesh = mesh_of(fsdp=2, pp=2)
    sp = shard_params(params, mesh)
    out = spmd_sampler(build_sampler(fwd, config), config, mesh)(
        sp, jax.random.PRNGKey(11), *args)
    np.testing.assert_array_equal(np.asarray(out.tokens), ref)


def test_batch_granule_enforced(setup):
    config, model, params, txt, _ = setup
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    mesh = mesh_of(fsdp=2, pp=2)
    assert batch_multiple(config, mesh) == 4  # dp2 * 2 microbatches
    sample = spmd_sampler(build_t2i_sampler(model, config), config, mesh)
    with pytest.raises(ValueError, match="granule"):
        sample(shard_params(params, mesh), jax.random.PRNGKey(0), txt[:3])


def test_validate_mesh_rejects_indivisible():
    config = cfg(**{"model.n_blocks": 6})
    with pytest.raises(ValueError, match="n_blocks"):
        validate_mesh(config, mesh_of(pp=4))


def test_engine_on_mesh_matches_single_device():
    """End-to-end: InferenceEngine(mesh=...) — padded batches, sharded
    weights — returns the same text/image ids as the plain engine."""
    from unidisc_tpu.serving.engine import InferenceEngine
    config = cfg()
    model, params = init_dit(jax.random.PRNGKey(0), config.model)
    plain = InferenceEngine(config, model, params)
    meshed = InferenceEngine(config, model, params,
                             mesh=mesh_of(fsdp=2, pp=2))
    reqs = [plain.prepare(text=f"shape {i}", task="gen_image")
            for i in range(3)]  # 3 rows -> granule pads to 4
    # pad the plain engine to the meshed granule (4): noise draws are
    # shaped (B, ...) so token-identity needs matching device batches
    a = plain.run_batch(list(reqs), seed=5, pad_to=4)
    b = meshed.run_batch(list(reqs), seed=5)
    assert len(a) == len(b) == 3
    for ra, rb in zip(a, b):
        np.testing.assert_array_equal(ra["image_ids"], rb["image_ids"])
        assert ra["text"] == rb["text"]
