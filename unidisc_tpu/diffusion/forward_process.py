"""Forward (corruption) process for absorbing-state masked diffusion.

Pure-function redesign of the reference's Diffusion.q_xt / _sample_t
(reference: model.py:424-619). Everything is shape-static and jit-friendly;
randomness flows through explicit jax PRNG keys.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def sample_t(rng: jax.Array, batch_size: int, *, antithetic: bool = True,
             sampling_eps: float = 1e-3) -> jax.Array:
    """Sample diffusion times t in [eps, 1], optionally antithetic
    (low-discrepancy) across the batch (reference: model.py:589-619)."""
    eps_t = jax.random.uniform(rng, (batch_size,))
    if antithetic:
        offset = jnp.arange(batch_size, dtype=jnp.float32) / batch_size
        eps_t = (eps_t / batch_size + offset) % 1.0
    return (1 - sampling_eps) * eps_t + sampling_eps


class CorruptionResult(NamedTuple):
    xt: jax.Array               # (B, L) int32 corrupted tokens
    move_indices: jax.Array     # (B, L) bool, True where masked
    # True for batch elements whose metrics should be ignored because an
    # entire modality was force-masked for CFG training
    batch_ignore: jax.Array     # (B,) bool


def q_xt(rng: jax.Array,
         x: jax.Array,
         move_chance: jax.Array,
         mask_index: int,
         *,
         modality: Optional[jax.Array] = None,
         mask_entire_modality: Optional[float] = None,
         allow_move_mask: Optional[jax.Array] = None,
         multimodal: bool = True) -> CorruptionResult:
    """Corrupt x -> xt by masking each token independently w.p. move_chance.

    Args:
      rng: PRNG key.
      x: (B, L) int tokens.
      move_chance: (B,) or (B, 1) per-sample masking probability.
      mask_index: the absorbing-state token id.
      modality: (B, L) int, 0=text 1=image. Needed for mask_entire_modality.
      mask_entire_modality: probability of masking an entire modality, used
        to train the unconditional branch for CFG
        (reference: model.py:470-539, trainer.mask_entire_modality=0.15).
      allow_move_mask: optional (B, L) bool; positions where masking is allowed.
      multimodal: selects between the reference's two entire-modality
        branches, which have DIFFERENT semantics. True (the production
        recipe: multimodal_batches=true, large_scale_train.yaml:139) mirrors
        model.py:526-531 — a fired modality mask REPLACES the row's random
        move indices, so the row becomes "this whole modality masked,
        everything else clean" (a pure CFG-unconditional sample). False
        mirrors the static-slice branch (model.py:532-539) — the modality
        mask is OR-ed on top of the random masking, and text-only rows
        never fire the image mask.

    Reference: model.py:424-587 (q_xt).
    """
    b = x.shape[0]
    move_chance = move_chance.reshape(b, 1)
    k_move, k_txt, k_img = jax.random.split(rng, 3)
    move_indices = jax.random.uniform(k_move, x.shape) < move_chance
    batch_ignore = jnp.zeros((b,), dtype=bool)

    if mask_entire_modality is not None:
        assert modality is not None, "mask_entire_modality requires modality"
        # sample txt/img whole-modality masks at p/2 each, cancel if both
        # fire (reference: model.py:479-480, 526-528 / 533-535)
        should_mask_txt = jax.random.uniform(k_txt, (b, 1)) < mask_entire_modality / 2
        should_mask_img = jax.random.uniform(k_img, (b, 1)) < mask_entire_modality / 2
        both = should_mask_txt & should_mask_img
        should_mask_txt = jnp.where(both, False, should_mask_txt)
        should_mask_img = jnp.where(both, False, should_mask_img)
        txt_sl = modality == 0
        img_sl = modality == 1
        if multimodal:
            # production branch: REPLACE the random masking with the
            # modality mask on fired rows (model.py:529-530)
            move_indices = jnp.where(should_mask_txt, txt_sl, move_indices)
            move_indices = jnp.where(should_mask_img, img_sl, move_indices)
        else:
            # static-slice branch: OR on top of random masking; text-only
            # samples never force-mask their (empty) image span
            # (model.py:536-538)
            all_txt = txt_sl.all(axis=-1, keepdims=True)
            should_mask_img = jnp.where(all_txt, False, should_mask_img)
            move_indices = jnp.where(should_mask_txt & txt_sl, True,
                                     move_indices)
            move_indices = jnp.where(should_mask_img & img_sl, True,
                                     move_indices)
        batch_ignore = (should_mask_txt | should_mask_img).squeeze(-1)

    if allow_move_mask is not None:
        move_indices = move_indices & allow_move_mask

    xt = jnp.where(move_indices, mask_index, x)
    return CorruptionResult(xt=xt, move_indices=move_indices, batch_ignore=batch_ignore)


def mask_image_square(rng: jax.Array, move_indices: jax.Array, img_start: int,
                      img_length: int) -> jax.Array:
    """Replace the image span's mask with a random square region; used for
    inpainting-style eval visualizations (reference: model.py:443-456).

    Shape-static: the square size d and position are sampled per batch element
    via traced uniforms, realized with broadcasted index comparisons.
    """
    b = move_indices.shape[0]
    side = int(round(img_length ** 0.5))
    assert side * side == img_length, "img_length must be a square"
    k_d, k_i, k_j = jax.random.split(rng, 3)
    # d in [side//2, side-2]
    d = jax.random.randint(k_d, (b, 1, 1), side // 2, side - 1)
    i0 = (jax.random.uniform(k_i, (b, 1, 1)) * (side - d + 1)).astype(jnp.int32)
    j0 = (jax.random.uniform(k_j, (b, 1, 1)) * (side - d + 1)).astype(jnp.int32)
    rows = jnp.arange(side).reshape(1, side, 1)
    cols = jnp.arange(side).reshape(1, 1, side)
    sq = (rows >= i0) & (rows < i0 + d) & (cols >= j0) & (cols < j0 + d)
    sq = sq.reshape(b, img_length)
    out = move_indices.at[:, img_start:img_start + img_length].set(sq)
    return out
