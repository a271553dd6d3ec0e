"""Continuous-image (transfusion) sampling: AR text + DDIM latents.

Redesign of the reference's sample_transfusion / sample_continuous_image
(reference: model_eval.py:2542-2628): the image span's continuous latents
are denoised with a DDIM loop (the model predicts the clean latent x0)
while text tokens are fixed conditioning; the transfusion attention mask
keeps text causal and the image block bidirectional. The whole DDIM loop
is one `lax.scan`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config
from unidisc_tpu.models.continuous import transfusion_mask


def cosine_alpha_bar(t):
    """Standard cosine schedule alpha_bar(t), t in [0, 1]."""
    return jnp.cos((t + 0.008) / 1.008 * jnp.pi / 2) ** 2


def build_continuous_sampler(apply_fn: Callable, config: Config, *,
                             latent_dim: int,
                             num_steps: Optional[int] = None) -> Callable:
    """apply_fn(params, ids, latents, sigma, modality, attn_mask)
    -> (logits, latent_x0_prediction).

    Returns sample(params, rng, ids, modality) -> denoised latents
    (B, L, latent_dim) for image positions (zeros elsewhere).
    """
    m = config.model
    steps = num_steps or config.sampling.steps

    def sample(params, rng, ids, modality):
        b, l = ids.shape
        mask = transfusion_mask(b, l, m.txt_length, modality)
        is_img = (modality == 1)[..., None]

        z = jax.random.normal(rng, (b, l, latent_dim)) * is_img
        ts = jnp.linspace(1.0 - 1e-3, 1e-3, steps + 1)

        def body(z, i):
            t = ts[i]
            t_next = ts[i + 1]
            a_t = cosine_alpha_bar(t)
            a_s = cosine_alpha_bar(t_next)
            sigma = jnp.full((b,), t)
            _, x0_pred = apply_fn(params, ids, z, sigma, modality, mask)
            x0_pred = x0_pred * is_img
            # DDIM (eta=0): eps from the x0 prediction, step to t_next
            eps = (z - jnp.sqrt(a_t) * x0_pred) / jnp.sqrt(1 - a_t)
            z_next = jnp.sqrt(a_s) * x0_pred + jnp.sqrt(1 - a_s) * eps
            return z_next * is_img, None

        z, _ = jax.lax.scan(body, z, jnp.arange(steps))
        return z

    return sample


def continuous_image_loss(latent_pred: jax.Array, latents: jax.Array,
                          modality: jax.Array) -> jax.Array:
    """MSE x0-prediction loss on image positions (the continuous branch of
    the reference's joint loss)."""
    is_img = (modality == 1)[..., None]
    se = ((latent_pred - latents) ** 2) * is_img
    return se.sum() / jnp.maximum(is_img.sum() * latents.shape[-1], 1)
