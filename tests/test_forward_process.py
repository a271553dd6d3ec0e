"""Tests for the corruption process and time sampling (reference: model.py:424-619)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.diffusion import q_xt, sample_t, mask_image_square

MASK = 99


def test_sample_t_antithetic_stratified():
    t = sample_t(jax.random.PRNGKey(0), 128, antithetic=True)
    t = np.sort(np.asarray(t))
    # antithetic sampling stratifies: one sample per 1/n bucket
    buckets = np.floor((t - 1e-3) / (1 - 1e-3) * 128).astype(int)
    assert len(np.unique(buckets)) >= 126
    assert t.min() >= 1e-3 and t.max() <= 1.0


def test_q_xt_masking_rate():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 4096), dtype=jnp.int32)
    move_chance = jnp.array([0.0, 0.25, 0.75, 1.0])
    res = q_xt(rng, x, move_chance, MASK)
    rates = np.asarray((res.xt == MASK).mean(axis=-1))
    np.testing.assert_allclose(rates, np.asarray(move_chance), atol=0.03)
    # unmasked positions keep original value
    assert np.all(np.asarray(res.xt)[~np.asarray(res.move_indices)] == 0)


def test_q_xt_mask_entire_modality():
    rng = jax.random.PRNGKey(3)
    b, l = 512, 32
    x = jnp.ones((b, l), dtype=jnp.int32)
    modality = jnp.concatenate(
        [jnp.zeros((b, l // 2), jnp.int32), jnp.ones((b, l // 2), jnp.int32)], axis=-1)
    res = q_xt(rng, x, jnp.full((b,), 0.1), MASK, modality=modality,
               mask_entire_modality=0.3)
    xt = np.asarray(res.xt)
    ignore = np.asarray(res.batch_ignore)
    # batch_ignore flags roughly 30% of samples (minus cancelations)
    assert 0.15 < ignore.mean() < 0.45
    # flagged samples have at least one fully-masked modality
    fully_txt = (xt[:, : l // 2] == MASK).all(axis=-1)
    fully_img = (xt[:, l // 2:] == MASK).all(axis=-1)
    assert np.all((fully_txt | fully_img)[ignore])


def test_q_xt_jit_compatible():
    fn = jax.jit(lambda r, x, mc: q_xt(r, x, mc, MASK).xt)
    out = fn(jax.random.PRNGKey(0), jnp.zeros((2, 16), jnp.int32), jnp.array([0.5, 0.5]))
    assert out.shape == (2, 16)


def test_mask_image_square():
    rng = jax.random.PRNGKey(0)
    b, txt, img = 3, 8, 64  # 8x8 image grid
    move = jnp.zeros((b, txt + img), dtype=bool)
    out = np.asarray(mask_image_square(rng, move, txt, img))
    for i in range(b):
        grid = out[i, txt:].reshape(8, 8)
        rows = np.where(grid.any(axis=1))[0]
        cols = np.where(grid.any(axis=0))[0]
        d = len(rows)
        assert 4 <= d <= 7  # side/2 .. side-2
        assert len(cols) == d
        # contiguous square
        assert grid[rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()
        assert grid.sum() == d * d
