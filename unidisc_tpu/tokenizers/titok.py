"""TiTok 1D image tokenizer in Flax.

TPU-native implementation of the reference's `titok64/128/256` backends
(reference: unidisc/tokenizers/image_tokenizers.py:126-141 — bytedance
1d-tokenizer TiTok, used by the small-scale configs). TiTok compresses an
image into a 1D sequence of K latent tokens (64/128/256) instead of a 2D
grid:

  encode: patchify (stride-16 conv) -> [patch tokens | K latent queries]
          -> ViT encoder -> take the K latent outputs -> project ->
          L2-normalized VQ against a small codebook
  decode: embed quantized codes -> [mask tokens (h*w) | latents] -> ViT
          decoder -> take the mask-token outputs -> project to 16x16x3
          pixel patches

ViT blocks are nn.scan-stacked (single compiled block). The VQ argmin is
one (B*K, D) x (D, N) matmul — MXU-friendly. `load_torch_state_dict`
ports a mirrored torch checkpoint (tests/test_titok.py); mapping the
published `yucornetto/tokenizer_titok_*` weights needs a key-rename pass
on a networked host (zero egress here).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class TiTokConfig:
    num_latent_tokens: int = 64
    codebook_size: int = 4096
    codebook_dim: int = 12          # titok uses a small VQ embedding dim
    hidden_size: int = 512
    n_layers: int = 8
    n_heads: int = 8
    patch_size: int = 16
    image_size: int = 256
    mlp_ratio: int = 4

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


def titok_preset(name: str, image_size: int = 256, **over) -> TiTokConfig:
    """Presets mirroring the published variants (titok64 = base/64 tokens,
    titok128 = base-large/128, titok256 = small-large/256)."""
    presets = {
        "titok64": dict(num_latent_tokens=64, hidden_size=768, n_layers=12,
                        n_heads=12, codebook_size=4096),
        "titok128": dict(num_latent_tokens=128, hidden_size=768, n_layers=12,
                         n_heads=12, codebook_size=8192),
        "titok256": dict(num_latent_tokens=256, hidden_size=512, n_layers=8,
                         n_heads=8, codebook_size=8192),
    }
    if name not in presets:
        raise ValueError(f"unknown titok preset {name!r}")
    cfg = dict(presets[name])
    cfg.update(over)
    return TiTokConfig(image_size=image_size, **cfg)


class ViTBlock(nn.Module):
    hidden: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, _=None):
        h = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        h = nn.SelfAttention(num_heads=self.heads, qkv_features=self.hidden,
                             deterministic=True, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(self.mlp_ratio * self.hidden, name="mlp_0")(h)
        h = nn.gelu(h, approximate=False)  # torch F.gelu default (erf)
        h = nn.Dense(self.hidden, name="mlp_2")(h)
        return x + h, None


def _vit_stack(n_layers, hidden, heads, mlp_ratio, name):
    return nn.scan(ViTBlock,
                   variable_axes={"params": 0},
                   split_rngs={"params": True},
                   length=n_layers,
                   metadata_params={nn.PARTITION_NAME: "layers"})(
        hidden, heads, mlp_ratio, name=name)


class TiTok(nn.Module):
    """encode: (B,H,W,3) in [-1,1] -> (B, K) ids; decode: ids -> image."""

    cfg: TiTokConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = nn.Conv(c.hidden_size,
                                   (c.patch_size, c.patch_size),
                                   strides=c.patch_size, padding="VALID",
                                   name="patch_embed")
        self.enc_pos = self.param(
            "enc_pos", nn.initializers.normal(0.02),
            (c.grid * c.grid + c.num_latent_tokens, c.hidden_size))
        self.latent_tokens = self.param(
            "latent_tokens", nn.initializers.normal(0.02),
            (c.num_latent_tokens, c.hidden_size))
        self.encoder = _vit_stack(c.n_layers, c.hidden_size, c.n_heads,
                                  c.mlp_ratio, "encoder")
        self.enc_norm = nn.LayerNorm(epsilon=1e-5, name="enc_norm")
        self.to_code = nn.Dense(c.codebook_dim, name="to_code")
        self.codebook = self.param(
            "codebook", nn.initializers.uniform(1.0),
            (c.codebook_size, c.codebook_dim))

        self.from_code = nn.Dense(c.hidden_size, name="from_code")
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (c.hidden_size,))
        self.dec_pos = self.param(
            "dec_pos", nn.initializers.normal(0.02),
            (c.grid * c.grid + c.num_latent_tokens, c.hidden_size))
        self.decoder = _vit_stack(c.n_layers, c.hidden_size, c.n_heads,
                                  c.mlp_ratio, "decoder")
        self.dec_norm = nn.LayerNorm(epsilon=1e-5, name="dec_norm")
        self.to_pixels = nn.Dense(c.patch_size * c.patch_size * 3,
                                  name="to_pixels")

    def _codes(self):
        cb = self.codebook.astype(jnp.float32)
        return cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True), 1e-8)

    def _encode_latents(self, images):
        c = self.cfg
        b = images.shape[0]
        patches = self.patch_embed(images).reshape(b, -1, c.hidden_size)
        lat = jnp.broadcast_to(self.latent_tokens[None],
                               (b, c.num_latent_tokens, c.hidden_size))
        x = jnp.concatenate([patches, lat], axis=1) + self.enc_pos[None]
        x, _ = self.encoder(x)
        x = self.enc_norm(x[:, -c.num_latent_tokens:])
        z = self.to_code(x).astype(jnp.float32)
        return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-8)

    def quantize(self, z):
        cb = self._codes()
        logits = 2.0 * jnp.einsum("bkd,nd->bkn", z, cb) \
            - jnp.sum(cb ** 2, axis=-1)
        return jnp.argmax(logits, axis=-1)

    def encode(self, images: jax.Array) -> jax.Array:
        return self.quantize(self._encode_latents(images))

    def decode(self, ids: jax.Array, grid: int = None) -> jax.Array:
        c = self.cfg
        g = c.grid
        b = ids.shape[0]
        zq = jnp.take(self._codes(), ids, axis=0)       # (B, K, D)
        lat = self.from_code(zq)
        masks = jnp.broadcast_to(self.mask_token[None, None],
                                 (b, g * g, c.hidden_size))
        x = jnp.concatenate([masks, lat], axis=1) + self.dec_pos[None]
        x, _ = self.decoder(x)
        x = self.dec_norm(x[:, :g * g])
        pix = self.to_pixels(x)                          # (B, g*g, p*p*3)
        p = c.patch_size
        pix = pix.reshape(b, g, g, p, p, 3)
        return pix.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * p, g * p, 3)

    def __call__(self, images: jax.Array):
        z = self._encode_latents(images)
        ids = self.quantize(z)
        zq = jnp.take(self._codes(), ids, axis=0)
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        # decode from the (straight-through) quantized latents
        c = self.cfg
        g, b = c.grid, images.shape[0]
        lat = self.from_code(zq)
        masks = jnp.broadcast_to(self.mask_token[None, None],
                                 (b, g * g, c.hidden_size))
        x = jnp.concatenate([masks, lat], axis=1) + self.dec_pos[None]
        x, _ = self.decoder(x)
        x = self.dec_norm(x[:, :g * g])
        p = c.patch_size
        pix = self.to_pixels(x).reshape(b, g, g, p, p, 3)
        recon = pix.transpose(0, 1, 3, 2, 4, 5).reshape(b, g * p, g * p, 3)
        return recon, ids


def load_torch_state_dict(params: dict, state_dict: dict,
                          n_layers: int) -> dict:
    """Map a mirrored torch TiTok state_dict onto TiTok params.

    Torch naming (mirror in tests/test_titok.py): patch_embed.{weight,bias},
    enc_pos / latent_tokens / mask_token / dec_pos / codebook (tensors),
    encoder.{i}.norm1.*, encoder.{i}.attn.in_proj_{weight,bias},
    encoder.{i}.attn.out_proj.*, encoder.{i}.mlp_{0,2}.*, enc_norm.*,
    to_code.*, from_code.*, dec_norm.*, to_pixels.* ; decoder mirrored.
    """
    import flax
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def put(fkey, arr, transpose=False, conv=False):
        assert fkey in flat, f"unknown flax key {fkey}"
        if conv:
            arr = np.transpose(arr, (2, 3, 1, 0))
        elif transpose and arr.ndim == 2:
            arr = arr.T
        assert arr.shape == flat[fkey].shape, \
            f"{fkey}: {arr.shape} vs {flat[fkey].shape}"
        out[fkey] = jnp.asarray(arr)

    put("patch_embed/kernel", sd["patch_embed.weight"], conv=True)
    put("patch_embed/bias", sd["patch_embed.bias"])
    for p in ("enc_pos", "latent_tokens", "mask_token", "dec_pos",
              "codebook"):
        put(p, sd[p])
    for dense in ("to_code", "from_code", "to_pixels"):
        put(f"{dense}/kernel", sd[f"{dense}.weight"], transpose=True)
        put(f"{dense}/bias", sd[f"{dense}.bias"])
    for norm in ("enc_norm", "dec_norm"):
        put(f"{norm}/scale", sd[f"{norm}.weight"])
        put(f"{norm}/bias", sd[f"{norm}.bias"])

    hid = flat["latent_tokens"].shape[-1]
    heads_axis = None
    for side in ("encoder", "decoder"):
        def stack(fn):
            return np.stack([fn(i) for i in range(n_layers)], 0)

        for norm in ("norm1", "norm2"):
            put(f"{side}/{norm}/scale",
                stack(lambda i: sd[f"{side}.{i}.{norm}.weight"]))
            put(f"{side}/{norm}/bias",
                stack(lambda i: sd[f"{side}.{i}.{norm}.bias"]))
        for mlp in ("mlp_0", "mlp_2"):
            put(f"{side}/{mlp}/kernel",
                stack(lambda i: sd[f"{side}.{i}.{mlp}.weight"].T))
            put(f"{side}/{mlp}/bias",
                stack(lambda i: sd[f"{side}.{i}.{mlp}.bias"]))
        # torch MultiheadAttention packs qkv in in_proj (3*hid, hid);
        # flax SelfAttention has query/key/value (hid, heads, head_dim)
        n_heads = flat[f"{side}/attn/query/kernel"].shape[-2]
        hd = flat[f"{side}/attn/query/kernel"].shape[-1]
        for qi, qname in enumerate(("query", "key", "value")):
            w = stack(lambda i: sd[f"{side}.{i}.attn.in_proj_weight"]
                      [qi * hid:(qi + 1) * hid].T)
            b = stack(lambda i: sd[f"{side}.{i}.attn.in_proj_bias"]
                      [qi * hid:(qi + 1) * hid])
            put(f"{side}/attn/{qname}/kernel",
                w.reshape(n_layers, hid, n_heads, hd))
            put(f"{side}/attn/{qname}/bias",
                b.reshape(n_layers, n_heads, hd))
        wo = stack(lambda i: sd[f"{side}.{i}.attn.out_proj.weight"].T)
        put(f"{side}/attn/out/kernel",
            wo.reshape(n_layers, n_heads, hd, hid))
        put(f"{side}/attn/out/bias",
            stack(lambda i: sd[f"{side}.{i}.attn.out_proj.bias"]))

    return flax.traverse_util.unflatten_dict(out, sep="/")
