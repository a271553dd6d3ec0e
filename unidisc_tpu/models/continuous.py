"""Continuous-latent (transfusion-style) image branch.

Redesign of the reference's secondary continuous mode
(reference: sample_transfusion/sample_continuous_image
model_eval.py:2542-2628; get_transfusion_mask models/dit.py:102-120;
continuous_mode branch dit.py:1300+): text stays discrete (AR), image
positions carry continuous VAE latents processed by the same transformer
through a linear projection in, with a linear head out predicting the
denoised latent.

`transfusion_mask` reproduces the reference's hybrid attention: causal
everywhere (AR text) except image queries attend to the full image block
(bidirectional diffusion).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from unidisc_tpu.config import ModelConfig
from unidisc_tpu.models.dit import DIT, torch_linear_init


def transfusion_mask(batch: int, length: int, img_start: int,
                     modality: jax.Array) -> jax.Array:
    """(B, L, L) bool: ar-causal | (image-query x image-key) bidirectional
    (reference: models/dit.py:102-120; text-only rows stay pure AR)."""
    rows = jnp.arange(length)[:, None]
    cols = jnp.arange(length)[None, :]
    ar = rows >= cols
    nar = (rows >= img_start) & (cols >= img_start)
    mask = ar | nar
    mask = jnp.broadcast_to(mask, (batch, length, length))
    text_only = (modality == 0).all(axis=-1)
    return jnp.where(text_only[:, None, None], ar[None], mask)


class TransfusionDIT(nn.Module):
    """DIT wrapper with a continuous-latent image pathway.

    __call__(ids, latents, sigma, modality, attn_mask): image positions
    (modality==1) take `latents` (B, L, latent_dim) through proj_in instead
    of the vocab embedding; returns (logits, latent_prediction).
    """

    cfg: ModelConfig
    latent_dim: int = 16
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ids, latents, sigma, modality, attn_mask=None,
                 deterministic=True):
        cfg = self.cfg
        proj_in = nn.Dense(cfg.hidden_size, dtype=self.compute_dtype,
                           kernel_init=torch_linear_init(), name="proj_in")
        proj_out = nn.Dense(self.latent_dim, dtype=jnp.float32,
                            kernel_init=torch_linear_init(),
                            name="proj_out")
        dit = DIT(cfg, compute_dtype=self.compute_dtype, name="dit")

        # intercept the DIT's embedding by adding the latent projection on
        # image positions; token ids there are pad and embed to a constant
        # that the projection displaces
        cont = proj_in(latents.astype(self.compute_dtype))
        is_img = (modality == 1)[..., None]

        logits, hidden = dit(ids, sigma, modality=modality,
                             attn_mask=attn_mask,
                             deterministic=deterministic,
                             extra_embed=jnp.where(is_img, cont, 0.0),
                             return_hidden=True)
        latent_pred = proj_out(hidden.astype(jnp.float32))
        return logits, latent_pred
