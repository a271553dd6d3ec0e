"""MAGVITv2-style LFQ VQGAN in Flax (the Show-o image tokenizer).

TPU-native implementation of the reference's `vae_type == "magvit"` backend
(reference: unidisc/tokenizers/image_tokenizers.py:166-187 — Show-o's
MAGVITv2 from `showlab/magvitv2`, used by the small-scale configs). The
architecture is a GroupNorm+SiLU conv VQGAN whose quantizer is
LOOKUP-FREE (LFQ, Yu et al. 2023): the latent has one channel per code
bit and the sign pattern *is* the token id — no codebook matmul at all,
which on TPU turns quantization into a pure VPU compare+weighted-sum and
decode into bit unpacking.

`load_torch_state_dict` ports a torch checkpoint with the mirrored naming
scheme (encoder.*, decoder.*, same block names as tokenizers/vqgan.py);
exact key remaps for the published `showlab/magvitv2` weights may need a
rename pass on a networked host (zero egress here — same caveat as
models/port.py, validated against torch mirrors in tests/test_magvit.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.tokenizers.vqgan import (Downsample, ResnetBlock, Upsample,
                                          group_norm, swish)


@dataclass(frozen=True)
class MagvitConfig:
    bits: int = 13                  # codebook = 2^13 = 8192 (showlab/magvitv2)
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)   # f=16
    num_res_blocks: int = 2
    dropout: float = 0.0

    @property
    def codebook_size(self) -> int:
        return 2 ** self.bits

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


class MagvitEncoder(nn.Module):
    cfg: MagvitConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout,
                                name=f"down_{i}_block_{j}")(h, deterministic)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_1")(
            h, deterministic)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_2")(
            h, deterministic)
        h = group_norm("norm_out")(h)
        h = swish(h)
        return nn.Conv(cfg.bits, (1, 1), name="conv_out")(h)


class MagvitDecoder(nn.Module):
    cfg: MagvitConfig

    @nn.compact
    def __call__(self, z, deterministic=True):
        cfg = self.cfg
        h = nn.Conv(cfg.ch * cfg.ch_mult[-1], (3, 3), padding=1,
                    name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_1")(
            h, deterministic)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_2")(
            h, deterministic)
        for i, mult in reversed(list(enumerate(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout,
                                name=f"up_{i}_block_{j}")(h, deterministic)
            if i != 0:
                h = Upsample(name=f"up_{i}_upsample")(h)
        h = group_norm("norm_out")(h)
        h = swish(h)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(h)


class MagvitLFQ(nn.Module):
    """encode: (B,H,W,3) in [-1,1] -> (B, h*w) ids; decode: ids -> image."""

    cfg: MagvitConfig

    def setup(self):
        self.encoder = MagvitEncoder(self.cfg, name="encoder")
        self.decoder = MagvitDecoder(self.cfg, name="decoder")

    def _bit_weights(self):
        return 2 ** jnp.arange(self.cfg.bits)

    def quantize(self, z: jax.Array) -> jax.Array:
        return jnp.sum((z > 0).astype(jnp.int32) * self._bit_weights(),
                       axis=-1)

    def lookup(self, ids: jax.Array) -> jax.Array:
        bits = ((ids[..., None] // self._bit_weights()) % 2)
        return 2.0 * bits.astype(jnp.float32) - 1.0

    def encode(self, images: jax.Array) -> jax.Array:
        z = self.encoder(images)
        ids = self.quantize(z)
        return ids.reshape(ids.shape[0], -1)

    def decode(self, ids: jax.Array, grid: int) -> jax.Array:
        z = self.lookup(ids.reshape(ids.shape[0], grid, grid))
        return self.decoder(z)

    def __call__(self, images: jax.Array):
        z = self.encoder(images)
        ids = self.quantize(z)
        zq = self.lookup(ids)
        # straight-through for codec training
        zq = jnp.tanh(z) + jax.lax.stop_gradient(zq - jnp.tanh(z))
        recon = self.decoder(zq)
        return recon, ids.reshape(ids.shape[0], -1)


def load_torch_state_dict(params: dict, state_dict: dict) -> dict:
    """Map a torch MAGVITv2 mirror state_dict onto MagvitLFQ params.

    Naming mirrors tokenizers/vqgan.py conventions: encoder.conv_in,
    encoder.down_{i}_block_{j}.{norm1,conv1,norm2,conv2,nin_shortcut},
    encoder.down_{i}_downsample.conv, encoder.mid_block_{1,2},
    encoder.norm_out, encoder.conv_out; decoder mirrored with up_*.
    """
    import flax
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)

    def put(fkey, val, conv):
        assert fkey in flat, f"unknown flax key {fkey}"
        arr = np.asarray(val)
        if conv and arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        assert arr.shape == flat[fkey].shape, \
            f"{fkey}: {arr.shape} vs {flat[fkey].shape}"
        out[fkey] = jnp.asarray(arr)

    for tkey, val in state_dict.items():
        fkey = tkey.replace(".", "/")
        leaf = fkey.rsplit("/", 1)[-1]
        base = fkey.rsplit("/", 1)[0]
        is_norm = "norm" in base.rsplit("/", 1)[-1]
        if leaf == "weight":
            put(f"{base}/{'scale' if is_norm else 'kernel'}", val,
                conv=not is_norm)
        elif leaf == "bias":
            put(f"{base}/bias", val, conv=False)
        else:
            raise KeyError(f"unexpected torch key {tkey}")

    return flax.traverse_util.unflatten_dict(out, sep="/")
