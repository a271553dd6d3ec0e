"""Video VQVAE: 3D-conv tokenizer for video clips.

Native TPU analog of the reference's video token backend (reference:
unidisc/tokenizers/image_tokenizers.py get_vae 'video_vqvae' /
Open-Sora-Plan branch, which wraps a VideoGPT-style 3D-conv VQVAE used
for video-token experiments). Design is TPU-first rather than a port:
NTHWC layout (XLA tiles 3D convs onto the MXU per-frame-batch), one
shared L2-normalized codebook quantizer matching tokenizers/vqgan.py
semantics, and pure encode/decode functions so the codec composes with
jit/scan like every other codec in image_codecs.py.

A clip (B, T, H, W, 3) in [-1, 1] encodes to ids
(B, T/t_down * H/s_down * W/s_down) laid out time-major — the natural
raster order for packing video tokens into the unified sequence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VideoVQConfig:
    codebook_size: int = 2048      # VideoGPT-scale default
    codebook_dim: int = 256
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2)   # one (2,2,2) stride per level
    num_res_blocks: int = 1
    l2_norm_codes: bool = True

    @property
    def downsample(self) -> int:
        """Spatial (and temporal) downsample factor: 2 per level."""
        return 2 ** len(self.ch_mult)


def _gn(name):
    return nn.GroupNorm(num_groups=8, epsilon=1e-6, name=name)


class ResBlock3D(nn.Module):
    cout: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = nn.silu(_gn("norm1")(x))
        h = nn.Conv(self.cout, (3, 3, 3), padding=1, name="conv1")(h)
        h = nn.silu(_gn("norm2")(h))
        h = nn.Conv(self.cout, (3, 3, 3), padding=1, name="conv2")(h)
        if cin != self.cout:
            x = nn.Conv(self.cout, (1, 1, 1), name="shortcut")(x)
        return x + h


class VideoEncoder(nn.Module):
    cfg: VideoVQConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3, 3), padding=1, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResBlock3D(cfg.ch * mult, name=f"res_{i}_{j}")(h)
            h = nn.Conv(cfg.ch * mult, (4, 4, 4), strides=(2, 2, 2),
                        padding=1, name=f"down_{i}")(h)
        h = ResBlock3D(cfg.ch * cfg.ch_mult[-1], name="mid")(h)
        h = nn.silu(_gn("norm_out")(h))
        return nn.Conv(cfg.codebook_dim, (1, 1, 1), name="conv_out")(h)


class VideoDecoder(nn.Module):
    cfg: VideoVQConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        h = nn.Conv(cfg.ch * cfg.ch_mult[-1], (3, 3, 3), padding=1,
                    name="conv_in")(z)
        h = ResBlock3D(cfg.ch * cfg.ch_mult[-1], name="mid")(h)
        for i, mult in reversed(list(enumerate(cfg.ch_mult))):
            b, t, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * t, 2 * hh, 2 * ww, c),
                                 "nearest")
            h = nn.Conv(cfg.ch * mult, (3, 3, 3), padding=1,
                        name=f"up_{i}")(h)
            for j in range(cfg.num_res_blocks):
                h = ResBlock3D(cfg.ch * mult, name=f"res_{i}_{j}")(h)
        h = nn.silu(_gn("norm_out")(h))
        return nn.Conv(3, (3, 3, 3), padding=1, name="conv_out")(h)


class VideoVQVAE(nn.Module):
    cfg: VideoVQConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = VideoEncoder(cfg, name="encoder")
        self.decoder = VideoDecoder(cfg, name="decoder")
        self.codebook = self.param(
            "codebook", nn.initializers.uniform(2.0 / cfg.codebook_size),
            (cfg.codebook_size, cfg.codebook_dim))

    def _codes(self):
        cb = self.codebook.astype(jnp.float32)
        if self.cfg.l2_norm_codes:
            cb = cb / jnp.maximum(
                jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-8)
        return cb

    def quantize(self, z: jax.Array) -> jax.Array:
        """Nearest-codebook ids for latents z (B, t, h, w, D) —
        argmin ||z - c||^2 = argmax <z, c> - ||c||^2/2 (one MXU dot,
        no (B*t*h*w, K, D) difference tensor)."""
        cb = self._codes()
        if self.cfg.l2_norm_codes:
            z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1,
                                                keepdims=True), 1e-8)
        score = jnp.einsum("...d,kd->...k", z.astype(jnp.float32), cb,
                           preferred_element_type=jnp.float32)
        score = score - 0.5 * jnp.sum(cb * cb, -1)
        return jnp.argmax(score, -1).astype(jnp.int32)

    def lookup(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self._codes(), ids, axis=0)

    def encode(self, clips: jax.Array) -> jax.Array:
        """(B, T, H, W, 3) -> ids (B, T' * H' * W') time-major."""
        z = self.encoder(clips)
        ids = self.quantize(z)
        return ids.reshape(ids.shape[0], -1)

    def decode(self, ids: jax.Array, t_grid: int, s_grid: int) -> jax.Array:
        z = self.lookup(ids).reshape(ids.shape[0], t_grid, s_grid,
                                     s_grid, self.cfg.codebook_dim)
        return self.decoder(z)

    def __call__(self, clips: jax.Array):
        ids = self.encode(clips)
        d = self.cfg.downsample
        t_grid, s_grid = clips.shape[1] // d, clips.shape[2] // d
        return self.decode(ids, t_grid, s_grid), ids
