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
             sampling_eps: float = 1e-3,
             force_timestep: Optional[float] = None) -> jax.Array:
    """Sample diffusion times t in [eps, 1], optionally antithetic
    (low-discrepancy) across the batch (reference: model.py:589-619).
    force_timestep pins the pre-eps uniform draw (debug/eval override,
    reference model.py:611-612)."""
    eps_t = jax.random.uniform(rng, (batch_size,))
    if antithetic:
        offset = jnp.arange(batch_size, dtype=jnp.float32) / batch_size
        eps_t = (eps_t / batch_size + offset) % 1.0
    if force_timestep is not None:
        eps_t = jnp.full_like(eps_t, force_timestep)
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
         multimodal: bool = True,
         sample_ids: Optional[jax.Array] = None,
         protect_first: bool = False,
         first_token_dropout: Optional[float] = None,
         diffusion_mode: str = "absorbing",
         text_vocab_size: Optional[int] = None,
         vocab_size: Optional[int] = None) -> CorruptionResult:
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

    if mask_entire_modality is not None and sample_ids is not None:
        # interleaved batches: per-BLOCK masking replaces the modality-level
        # branch entirely (reference: model.py:483-522 — should_mask_txt/img
        # are drawn but unused on this path)
        assert modality is not None, "mask_entire_modality requires modality"
        fired, row_fired = interleaved_block_mask(
            jax.random.fold_in(rng, 3), modality, sample_ids,
            mask_entire_modality)
        move_indices = move_indices | fired
        batch_ignore = row_fired
    elif mask_entire_modality is not None:
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

    if protect_first:
        # label-as-token conditioning: the position-0 label is never
        # corrupted (reference: model.py:553-554 add_label)
        move_indices = move_indices.at[:, 0].set(False)
    if first_token_dropout is not None:
        # label-CFG: mask the label with prob p and exclude those rows
        # from the NELBO metrics (reference: model.py:556-563)
        dropped = jax.random.uniform(
            jax.random.fold_in(rng, 5), (b,)) < first_token_dropout
        move_indices = move_indices.at[:, 0].set(
            jnp.where(dropped, True, move_indices[:, 0]))
        batch_ignore = batch_ignore | dropped

    if allow_move_mask is not None:
        move_indices = move_indices & allow_move_mask

    if diffusion_mode == "uniform":
        # uniform corruption: random in-vocab tokens instead of the
        # absorbing mask (reference: trainer.discrete_diffusion_mode,
        # model.py:567-578). With modality + vocab split given, draws stay
        # within each position's modality vocab and never hit mask_index
        # (the reference's force_argmax_valid_indices branch); otherwise
        # a full-vocab draw with mask_index bumped to mask_index+1.
        assert vocab_size is not None, "uniform mode needs vocab_size"
        k_rand = jax.random.fold_in(rng, 9)
        if modality is not None and text_vocab_size is not None:
            k_t, k_i = jax.random.split(k_rand)
            txt_rand = jax.random.randint(k_t, x.shape, 0,
                                          text_vocab_size - 1)
            img_rand = jax.random.randint(k_i, x.shape, text_vocab_size,
                                          vocab_size)
            random_tokens = jnp.where(modality == 0, txt_rand, img_rand)
        else:
            random_tokens = jax.random.randint(k_rand, x.shape, 0,
                                               vocab_size)
            random_tokens = jnp.where(random_tokens == mask_index,
                                      random_tokens + 1, random_tokens)
        xt = jnp.where(move_indices, random_tokens.astype(x.dtype), x)
    else:
        xt = jnp.where(move_indices, mask_index, x)
    return CorruptionResult(xt=xt, move_indices=move_indices, batch_ignore=batch_ignore)


def interleaved_block_mask(rng: jax.Array, modality: jax.Array,
                           sample_ids: jax.Array, mask_prob: float, *,
                           max_samples: int = 16):
    """Entire-BLOCK masking for interleaved batches — the production
    interleaved-training CFG corruption (reference: model.py:483-522).

    Blocks are contiguous runs of constant (modality, sample_id)
    (reference: tensor_utils.get_contiguous_blocks_per_sample). Each block
    with size > 4 and sample_id >= 0 is fully masked with probability
    mask_prob * 2 * (k+1)/K, where k is the block's ordinal within its
    sample and K the sample's (filtered) block count — later blocks, which
    have more conditioning available, are masked more often.

    Shape-static redesign: per-position block ids via a change-flag cumsum,
    block sizes via a scatter-add, per-sample ordinals via a one-hot cumsum
    over at most `max_samples` sample ids, and one uniform draw per
    position of which only the draw at each block's START gates that whole
    block (so the fired decision is constant across the block).

    Returns (block_move (B, L) bool, row_fired (B,) bool).
    """
    b, l = modality.shape
    pos = jnp.arange(l)
    change = jnp.concatenate([
        jnp.ones((b, 1), bool),
        (modality[:, 1:] != modality[:, :-1])
        | (sample_ids[:, 1:] != sample_ids[:, :-1])], axis=1)
    block_id = jnp.cumsum(change.astype(jnp.int32), axis=1) - 1   # (B, L)
    sizes = jax.vmap(
        lambda bid: jnp.zeros((l,), jnp.int32).at[bid].add(1))(block_id)
    size_per_pos = jnp.take_along_axis(sizes, block_id, axis=1)
    valid = (sample_ids >= 0) & (size_per_pos > 4)
    starts = change & valid

    sid = jnp.clip(sample_ids, 0, max_samples - 1)
    onehot = (jax.nn.one_hot(sid, max_samples, dtype=jnp.int32)
              * starts[..., None].astype(jnp.int32))       # (B, L, S)
    cum = jnp.cumsum(onehot, axis=1)                        # inclusive
    total = cum[:, -1, :]                                   # (B, S)
    k_at = jnp.take_along_axis(cum, sid[..., None],
                               axis=2).squeeze(-1) - 1      # ordinal at starts
    total_at = jnp.take_along_axis(
        jnp.broadcast_to(total[:, None, :], (b, l, max_samples)),
        sid[..., None], axis=2).squeeze(-1)
    block_prob = (k_at + 1).astype(jnp.float32) / jnp.maximum(
        total_at, 1).astype(jnp.float32)

    u = jax.random.uniform(rng, (b, l))
    fired_at_start = starts & (u < mask_prob * 2.0 * block_prob)
    # propagate each block's start decision across the block
    start_pos = jax.lax.cummax(jnp.where(change, pos, -1), axis=1)
    fired = jnp.take_along_axis(fired_at_start, start_pos, axis=1) & valid
    return fired, fired_at_start.any(axis=1)


def mask_text_region(rng: jax.Array, move_indices: jax.Array, x: jax.Array,
                     txt_length: int, eos_id: int) -> jax.Array:
    """Replace the text span's mask with one random contiguous region per
    row, bounded by the first EOS (reference: model.py:457-466
    mask_text_region — used by the masked-infill eval visualizations).

    Per row: max_valid = index of the first EOS (or txt_length);
    d ~ U[max_valid//3, max_valid-1]; start ~ U[0, max_valid-d];
    positions [start, start+d) are masked. Shape-static: traced uniforms
    realize the integer draws, broadcast comparisons build the region.
    """
    b = move_indices.shape[0]
    txt = x[:, :txt_length]
    is_eos = txt == eos_id
    has_eos = is_eos.any(axis=-1)
    first_eos = jnp.argmax(is_eos, axis=-1)
    max_valid = jnp.where(has_eos, first_eos, txt_length)  # (B,)
    max_valid = jnp.maximum(max_valid, 2)  # degenerate rows: tiny region
    k_d, k_s = jax.random.split(rng)
    lo = max_valid // 3
    hi = max_valid - 1
    d = (lo + jax.random.uniform(k_d, (b,)) * (hi - lo + 1)).astype(
        jnp.int32)
    d = jnp.clip(d, 1, hi)
    start = (jax.random.uniform(k_s, (b,)) * (max_valid - d + 1)).astype(
        jnp.int32)
    pos = jnp.arange(txt_length)[None, :]
    region = (pos >= start[:, None]) & (pos < (start + d)[:, None])
    return move_indices.at[:, :txt_length].set(region)


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
