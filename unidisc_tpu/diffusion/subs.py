"""SUBS parameterization (zero-masking-probability + carry-over-unmasking).

Pure functions over logits, replacing Diffusion._subs_parameterization
(reference: model.py:621-658). Output is normalized log-probabilities with:
  * log p(mask) = -inf (the model never predicts the absorbing state)
  * per-modality vocabulary restriction (force_argmax_valid_indices)
  * unmasked tokens pinned to a delta on their current value (carry-over)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INFINITY = -1_000_000.0


def restrict_modality_logits(logits: jax.Array, modality: jax.Array,
                             text_vocab_size: int) -> jax.Array:
    """Mask out cross-modality vocab entries (force_argmax_valid_indices).

    Text positions (modality==0) may only predict ids < text_vocab_size;
    image positions (modality==1) only ids >= text_vocab_size
    (reference: model.py:626-637).
    """
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    is_txt_id = (ids < text_vocab_size).reshape((1,) * (logits.ndim - 1) + (vocab,))
    pos_is_txt = (modality == 0)[..., None]
    valid = jnp.where(pos_is_txt, is_txt_id, ~is_txt_id)
    return jnp.where(valid, logits, NEG_INFINITY)


def subs_parameterization(logits: jax.Array,
                          xt: Optional[jax.Array],
                          mask_index: int,
                          *,
                          modality: Optional[jax.Array] = None,
                          text_vocab_size: Optional[int] = None,
                          normalize: bool = True) -> jax.Array:
    """Convert raw logits to normalized log p(x0 | xt).

    Args:
      logits: (..., L, V) raw backbone output.
      xt: (..., L) current tokens, or None (CFG path normalizes combined
        logits without carry-over, reference: model_eval.py:1812-1817).
      mask_index: absorbing token id.
      modality: optional (..., L) 0/1 modality ids for vocab restriction.
      text_vocab_size: required when modality is given.

    Reference: model.py:621-658.
    """
    vocab = logits.shape[-1]
    ids = jnp.arange(vocab)
    # log p(mask) = -inf
    logits = logits + jnp.where(ids == mask_index, NEG_INFINITY, 0.0)

    if modality is not None:
        assert text_vocab_size is not None
        logits = restrict_modality_logits(logits, modality, text_vocab_size)

    # normalize=False returns masked UNNORMALIZED log-weights (argmax /
    # Gumbel-argmax are shift-invariant per position, so samplers that only
    # need the argmax + a per-position logsumexp skip materializing the
    # log-softmax over the 48k vocab — the TPU hot-path optimization)
    log_probs = jax.nn.log_softmax(logits, axis=-1) if normalize else logits

    if xt is not None:
        # carry-over unmasking: unmasked positions are deltas at xt
        unmasked = (xt != mask_index)[..., None]
        delta = jnp.where(ids == xt[..., None], 0.0, NEG_INFINITY)
        log_probs = jnp.where(unmasked, delta, log_probs)

    return log_probs
