"""LlamaGen-style VQGAN image tokenizer in Flax (the production codec).

TPU-native implementation of the reference's LlamaGen VQ-8/VQ-16 tokenizer
(reference: unidisc/tokenizers/image_tokenizers.py:51-67 — VQ_models["VQ-16"]
with codebook_size=16384, codebook_embed_dim=256; encode/decode adapters
vae_encode_image:191-260, vae_decode_image:264-363). Architecture follows
the public LlamaGen VQGAN: conv encoder with GroupNorm+swish res-blocks and
mid attention, L2-normalized codebook vector quantizer, mirrored decoder.
Downsample factor 16 => 256 tokens for a 256px image.

All convs are NHWC (XLA's preferred TPU layout). `load_torch_state_dict`
ports the published torch checkpoints (vq_ds16_c2i.pt) into this module's
param tree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclass(frozen=True)
class VQConfig:
    codebook_size: int = 16384
    codebook_dim: int = 256  # reference passes codebook_embed_dim=256
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)  # VQ-16 (f=16)
    num_res_blocks: int = 2
    z_channels: int = 256
    dropout: float = 0.0
    l2_norm_codes: bool = True
    # levels (indices into ch_mult) with per-block spatial attention —
    # taming-layout VQGANs attend at low resolutions (attn_resolutions);
    # LlamaGen dropped intra-level attention so the default is none
    attn_levels: Tuple[int, ...] = ()
    # MaskGIT's tokenizer is pure conv (no bottleneck attention) and its
    # encoder emits the codebook dim directly (no 1x1 quant projections)
    mid_attn: bool = True
    use_quant_conv: bool = True

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


def vq8_config(**over) -> VQConfig:
    return VQConfig(ch_mult=(1, 2, 2, 4), **over)


def taming_config(**over) -> VQConfig:
    """Published taming-transformers VQGAN f16 layout
    (vqgan_imagenet_f16_16384: ch_mult [1,1,2,2,4], attn at the
    16px bottleneck level, raw — not L2-normalized — codes)."""
    base = dict(ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
                z_channels=256, codebook_size=16384, codebook_dim=256,
                l2_norm_codes=False, attn_levels=(4,))
    base.update(over)
    return VQConfig(**base)


def maskgit_config(**over) -> VQConfig:
    """MaskGIT-class f16 VQGAN (the reference's 'maskgit' backend,
    unidisc/tokenizers/image_tokenizers.py:27-31, whose model code the
    reference snapshot does not ship): pure-conv ResNet encoder/decoder
    (no attention anywhere), 1024-entry codebook at dim 256 emitted
    directly by the encoder (no 1x1 quant projections), raw — not
    L2-normalized — codes. Foreign-named published weights load via the
    structural auto-remap (tokenizers/remap.py)."""
    base = dict(ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
                z_channels=256, codebook_size=1024, codebook_dim=256,
                l2_norm_codes=False, attn_levels=(), mid_attn=False,
                use_quant_conv=False)
    base.update(over)
    return VQConfig(**base)


def chameleon_config(**over) -> VQConfig:
    """Chameleon/Anole f16 image VQGAN (the VQ stage under the reference's
    chameleon/anole/lumina stream tokenizers, chameleon_tokenizers.py —
    Lumina-mGPT reuses the same VQ model): taming-layout conv VQGAN with
    bottleneck attention and an 8192-entry codebook. Pairs with the native
    stream codec (tokenizers/chameleon.py), which wraps any ImageCodec."""
    base = dict(ch_mult=(1, 1, 2, 2, 4), num_res_blocks=2,
                z_channels=256, codebook_size=8192, codebook_dim=256,
                l2_norm_codes=False, attn_levels=(4,))
    base.update(over)
    return VQConfig(**base)


def swish(x):
    return x * jax.nn.sigmoid(x)


def group_norm(name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                        name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = group_norm("norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = group_norm("norm2")(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention at the bottleneck."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = group_norm("norm")(x)
        q = nn.Conv(c, (1, 1), name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * (c ** -0.5),
            axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", attn.astype(v.dtype), v)
        out = nn.Conv(c, (1, 1), name="proj_out")(out.reshape(b, h, w, c))
        return x + out


class Downsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        # torch pads asymmetrically (0,1,0,1) for stride-2 conv
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       name="conv")(x)


class Upsample(nn.Module):
    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return nn.Conv(c, (3, 3), padding=1, name="conv")(x)


class Encoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout,
                                name=f"down_{i}_block_{j}")(h, deterministic)
                if i in cfg.attn_levels:
                    h = AttnBlock(name=f"down_{i}_attn_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_1")(
            h, deterministic)
        if cfg.mid_attn:
            h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_2")(
            h, deterministic)
        h = group_norm("norm_out")(h)
        h = swish(h)
        out_ch = cfg.z_channels if cfg.use_quant_conv else cfg.codebook_dim
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, z, deterministic=True):
        cfg = self.cfg
        h = nn.Conv(cfg.ch * cfg.ch_mult[-1], (3, 3), padding=1,
                    name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_1")(
            h, deterministic)
        if cfg.mid_attn:
            h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], cfg.dropout, name="mid_block_2")(
            h, deterministic)
        for i, mult in reversed(list(enumerate(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(cfg.ch * mult, cfg.dropout,
                                name=f"up_{i}_block_{j}")(h, deterministic)
                if i in cfg.attn_levels:
                    h = AttnBlock(name=f"up_{i}_attn_{j}")(h)
            if i != 0:
                h = Upsample(name=f"up_{i}_upsample")(h)
        h = group_norm("norm_out")(h)
        h = swish(h)
        return nn.Conv(3, (3, 3), padding=1, name="conv_out")(h)


class VQGAN(nn.Module):
    """encode: image (B,H,W,3) in [-1,1] -> token ids (B, h*w);
    decode: ids -> image. Codebook lookups are embedding gathers — pure
    MXU/HBM friendly ops."""

    cfg: VQConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        if cfg.use_quant_conv:
            self.quant_conv = nn.Conv(cfg.codebook_dim, (1, 1),
                                      name="quant_conv")
            self.post_quant_conv = nn.Conv(cfg.z_channels, (1, 1),
                                           name="post_quant_conv")
        else:
            # MaskGIT layout: the encoder emits codebook_dim directly and
            # the decoder consumes code vectors directly
            self.quant_conv = lambda z: z
            self.post_quant_conv = lambda zq: zq
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
        """Nearest-codebook-entry ids for latents z (B,h,w,D)."""
        cb = self._codes()
        zf = z.astype(jnp.float32)
        if self.cfg.l2_norm_codes:
            zf = zf / jnp.maximum(
                jnp.linalg.norm(zf, axis=-1, keepdims=True), 1e-8)
        # argmin ||z - c||^2 = argmax (2 z.c - ||c||^2); one big matmul
        logits = 2.0 * jnp.einsum("bhwd,nd->bhwn", zf, cb) \
            - jnp.sum(cb ** 2, axis=-1)
        return jnp.argmax(logits, axis=-1)

    def lookup(self, ids: jax.Array) -> jax.Array:
        return jnp.take(self._codes(), ids, axis=0)

    def encode(self, images: jax.Array) -> jax.Array:
        z = self.encoder(images)
        z = self.quant_conv(z)
        ids = self.quantize(z)
        return ids.reshape(ids.shape[0], -1)

    def decode(self, ids: jax.Array, grid: int) -> jax.Array:
        zq = self.lookup(ids.reshape(ids.shape[0], grid, grid))
        zq = self.post_quant_conv(zq)
        return self.decoder(zq)

    def __call__(self, images: jax.Array):
        """Autoencode roundtrip (training/eval); returns (recon, ids)."""
        z = self.quant_conv(self.encoder(images))
        ids = self.quantize(z)
        zq = self.lookup(ids)
        # straight-through estimator for codec training
        zq = z + jax.lax.stop_gradient(zq - z)
        recon = self.decoder(self.post_quant_conv(zq))
        return recon, ids.reshape(ids.shape[0], -1)


# ---------------------------------------------------------------------------
# torch checkpoint porting
# ---------------------------------------------------------------------------

def _convert_conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_state_dict(params: dict, state_dict: dict) -> dict:
    """Map a LlamaGen VQModel torch state_dict onto VQGAN params.

    Torch names (public LlamaGen tokenizer/tokenizer_image/vq_model.py):
      encoder.conv_in.*, encoder.conv_blocks.{i}.res.{j}.*,
      encoder.conv_blocks.{i}.downsample.conv.*, encoder.mid.0/1/2.*,
      encoder.norm_out.*, encoder.conv_out.*, quantize.embedding.weight,
      quant_conv.*, post_quant_conv.*, decoder.* (mirrored).
    """
    import flax
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)

    def put(fkey, val, conv):
        assert fkey in flat, f"unknown flax key {fkey}"
        arr = np.asarray(val)
        if conv and arr.ndim == 4:
            arr = _convert_conv(arr)
        assert arr.shape == flat[fkey].shape, \
            f"{fkey}: {arr.shape} vs {flat[fkey].shape}"
        out[fkey] = jnp.asarray(arr)

    def map_resblock(tprefix, fprefix):
        for tn, fn in [("norm1", "norm1"),
                       ("norm2", "norm2")]:
            put(f"{fprefix}/{fn}/scale", state_dict[f"{tprefix}.{tn}.weight"],
                False)
            put(f"{fprefix}/{fn}/bias", state_dict[f"{tprefix}.{tn}.bias"],
                False)
        for tn in ["conv1", "conv2"]:
            put(f"{fprefix}/{tn}/kernel", state_dict[f"{tprefix}.{tn}.weight"],
                True)
            put(f"{fprefix}/{tn}/bias", state_dict[f"{tprefix}.{tn}.bias"],
                False)
        if f"{tprefix}.nin_shortcut.weight" in state_dict:
            put(f"{fprefix}/nin_shortcut/kernel",
                state_dict[f"{tprefix}.nin_shortcut.weight"], True)
            put(f"{fprefix}/nin_shortcut/bias",
                state_dict[f"{tprefix}.nin_shortcut.bias"], False)

    def map_attn(tprefix, fprefix):
        put(f"{fprefix}/norm/scale",
            state_dict[f"{tprefix}.norm.weight"], False)
        put(f"{fprefix}/norm/bias",
            state_dict[f"{tprefix}.norm.bias"], False)
        for n in ["q", "k", "v", "proj_out"]:
            put(f"{fprefix}/{n}/kernel", state_dict[f"{tprefix}.{n}.weight"],
                True)
            put(f"{fprefix}/{n}/bias", state_dict[f"{tprefix}.{n}.bias"],
                False)

    cfg_levels = 0
    while any(k.startswith(f"encoder.conv_blocks.{cfg_levels}.")
              for k in state_dict):
        cfg_levels += 1
    n_res = 0
    while f"encoder.conv_blocks.0.res.{n_res}.conv1.weight" in state_dict:
        n_res += 1

    for side in ["encoder", "decoder"]:
        put(f"{side}/conv_in/kernel", state_dict[f"{side}.conv_in.weight"],
            True)
        put(f"{side}/conv_in/bias", state_dict[f"{side}.conv_in.bias"], False)
        put(f"{side}/conv_out/kernel", state_dict[f"{side}.conv_out.weight"],
            True)
        put(f"{side}/conv_out/bias", state_dict[f"{side}.conv_out.bias"],
            False)
        put(f"{side}/norm_out/scale",
            state_dict[f"{side}.norm_out.weight"], False)
        put(f"{side}/norm_out/bias",
            state_dict[f"{side}.norm_out.bias"], False)
        map_resblock(f"{side}.mid.0", f"{side}/mid_block_1")
        map_attn(f"{side}.mid.1", f"{side}/mid_attn_1")
        map_resblock(f"{side}.mid.2", f"{side}/mid_block_2")

    # encoder levels
    for i in range(cfg_levels):
        dec_side = "decoder" in state_dict  # noqa: F841
        for j in range(n_res):
            map_resblock(f"encoder.conv_blocks.{i}.res.{j}",
                         f"encoder/down_{i}_block_{j}")
        if f"encoder.conv_blocks.{i}.downsample.conv.weight" in state_dict:
            put(f"encoder/down_{i}_downsample/conv/kernel",
                state_dict[f"encoder.conv_blocks.{i}.downsample.conv.weight"],
                True)
            put(f"encoder/down_{i}_downsample/conv/bias",
                state_dict[f"encoder.conv_blocks.{i}.downsample.conv.bias"],
                False)
    # decoder levels: torch conv_blocks index runs from bottleneck (level
    # cfg_levels-1) down to 0; block index has num_res_blocks+1 entries
    for bi in range(cfg_levels):
        i = cfg_levels - 1 - bi
        for j in range(n_res + 1):
            map_resblock(f"decoder.conv_blocks.{bi}.res.{j}",
                         f"decoder/up_{i}_block_{j}")
        if f"decoder.conv_blocks.{bi}.upsample.conv.weight" in state_dict:
            put(f"decoder/up_{i}_upsample/conv/kernel",
                state_dict[f"decoder.conv_blocks.{bi}.upsample.conv.weight"],
                True)
            put(f"decoder/up_{i}_upsample/conv/bias",
                state_dict[f"decoder.conv_blocks.{bi}.upsample.conv.bias"],
                False)

    put("codebook", state_dict["quantize.embedding.weight"], False)
    for n in ["quant_conv", "post_quant_conv"]:
        put(f"{n}/kernel", state_dict[f"{n}.weight"], True)
        put(f"{n}/bias", state_dict[f"{n}.bias"], False)

    return flax.traverse_util.unflatten_dict(out, sep="/")


# ---------------------------------------------------------------------------
# KL-VAE (continuous latents; the reference's Stable-Diffusion VAE backend,
# image_tokenizers.py "sd-vae" — used by its continuous/transfusion branch)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class KLVAEConfig:
    """SD-VAE-class autoencoder (taming `double_z` layout): encoder emits
    2*z_channels moments (mean, logvar), latents are sampled/meaned and
    multiplied by scale_factor (SD convention 0.18215)."""
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)  # f=8
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    scale_factor: float = 0.18215
    dropout: float = 0.0

    @property
    def downsample(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


class KLVAE(nn.Module):
    """Continuous VAE codec for the transfusion/continuous-latent branch
    (models/continuous.py): encode images -> (B, h*w, embed_dim) scaled
    latents; decode latents -> images. Reuses the taming Encoder/Decoder
    stacks (same conv trunk as the VQGAN above)."""

    cfg: KLVAEConfig

    def setup(self):
        c = self.cfg
        enc_cfg = VQConfig(ch=c.ch, ch_mult=c.ch_mult,
                           num_res_blocks=c.num_res_blocks,
                           z_channels=2 * c.z_channels, dropout=c.dropout)
        dec_cfg = VQConfig(ch=c.ch, ch_mult=c.ch_mult,
                           num_res_blocks=c.num_res_blocks,
                           z_channels=c.z_channels, dropout=c.dropout)
        self.encoder = Encoder(enc_cfg, name="encoder")
        self.decoder = Decoder(dec_cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * c.embed_dim, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1),
                                       name="post_quant_conv")

    def moments(self, images: jax.Array):
        """(mean, logvar), each (B, h, w, embed_dim)."""
        h = self.quant_conv(self.encoder(images))
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, images: jax.Array, rng=None) -> jax.Array:
        """Scaled latents (B, h*w, embed_dim); rng=None takes the
        posterior mean (deterministic), else one reparameterized
        sample."""
        mean, logvar = self.moments(images)
        z = mean
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        z = z * self.cfg.scale_factor
        b, hh, ww, c = z.shape
        return z.reshape(b, hh * ww, c)

    def decode(self, latents: jax.Array, grid: int) -> jax.Array:
        b = latents.shape[0]
        z = latents.reshape(b, grid, grid, -1) / self.cfg.scale_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, images: jax.Array, rng=None):
        """Autoencode roundtrip; returns (recon, mean, logvar) — the KL
        term for codec training is standard normal vs (mean, logvar)."""
        mean, logvar = self.moments(images)
        z = mean
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype)
        recon = self.decoder(self.post_quant_conv(z))
        return recon, mean, logvar


def _map_compvis_autoencoder(flat: dict, out: dict,
                             state_dict: dict) -> None:
    """Map a CompVis/taming-naming conv autoencoder (the published
    taming VQModel AND SD `first_stage_model` share it:
    encoder.down.{i}.block.{j}.*, optional encoder.down.{i}.attn.{j}.*,
    encoder.mid.block_1/attn_1/block_2, decoder.up.{i}.*, quant_conv,
    post_quant_conv) onto the shared flax Encoder/Decoder naming,
    writing into `out` (a flat params dict keyed with '/')."""

    def put(fkey, val, conv):
        assert fkey in flat, f"unknown flax key {fkey}"
        arr = np.asarray(val)
        if conv and arr.ndim == 4:
            arr = _convert_conv(arr)
        assert arr.shape == flat[fkey].shape, \
            f"{fkey}: {arr.shape} vs {flat[fkey].shape}"
        out[fkey] = jnp.asarray(arr)

    def map_resblock(tprefix, fprefix):
        for tn in ["norm1", "norm2"]:
            put(f"{fprefix}/{tn}/scale", state_dict[f"{tprefix}.{tn}.weight"],
                False)
            put(f"{fprefix}/{tn}/bias", state_dict[f"{tprefix}.{tn}.bias"],
                False)
        for tn in ["conv1", "conv2"]:
            put(f"{fprefix}/{tn}/kernel", state_dict[f"{tprefix}.{tn}.weight"],
                True)
            put(f"{fprefix}/{tn}/bias", state_dict[f"{tprefix}.{tn}.bias"],
                False)
        if f"{tprefix}.nin_shortcut.weight" in state_dict:
            put(f"{fprefix}/nin_shortcut/kernel",
                state_dict[f"{tprefix}.nin_shortcut.weight"], True)
            put(f"{fprefix}/nin_shortcut/bias",
                state_dict[f"{tprefix}.nin_shortcut.bias"], False)

    def map_attn(tprefix, fprefix):
        put(f"{fprefix}/norm/scale", state_dict[f"{tprefix}.norm.weight"],
            False)
        put(f"{fprefix}/norm/bias", state_dict[f"{tprefix}.norm.bias"],
            False)
        for n in ["q", "k", "v", "proj_out"]:
            put(f"{fprefix}/{n}/kernel", state_dict[f"{tprefix}.{n}.weight"],
                True)
            put(f"{fprefix}/{n}/bias", state_dict[f"{tprefix}.{n}.bias"],
                False)

    levels = 0
    while any(k.startswith(f"encoder.down.{levels}.") for k in state_dict):
        levels += 1
    n_res = 0
    while f"encoder.down.0.block.{n_res}.conv1.weight" in state_dict:
        n_res += 1

    for side in ["encoder", "decoder"]:
        put(f"{side}/conv_in/kernel", state_dict[f"{side}.conv_in.weight"],
            True)
        put(f"{side}/conv_in/bias", state_dict[f"{side}.conv_in.bias"],
            False)
        put(f"{side}/conv_out/kernel", state_dict[f"{side}.conv_out.weight"],
            True)
        put(f"{side}/conv_out/bias", state_dict[f"{side}.conv_out.bias"],
            False)
        put(f"{side}/norm_out/scale", state_dict[f"{side}.norm_out.weight"],
            False)
        put(f"{side}/norm_out/bias", state_dict[f"{side}.norm_out.bias"],
            False)
        map_resblock(f"{side}.mid.block_1", f"{side}/mid_block_1")
        map_attn(f"{side}.mid.attn_1", f"{side}/mid_attn_1")
        map_resblock(f"{side}.mid.block_2", f"{side}/mid_block_2")

    for i in range(levels):
        for j in range(n_res):
            map_resblock(f"encoder.down.{i}.block.{j}",
                         f"encoder/down_{i}_block_{j}")
            if f"encoder.down.{i}.attn.{j}.norm.weight" in state_dict:
                map_attn(f"encoder.down.{i}.attn.{j}",
                         f"encoder/down_{i}_attn_{j}")
        if f"encoder.down.{i}.downsample.conv.weight" in state_dict:
            put(f"encoder/down_{i}_downsample/conv/kernel",
                state_dict[f"encoder.down.{i}.downsample.conv.weight"],
                True)
            put(f"encoder/down_{i}_downsample/conv/bias",
                state_dict[f"encoder.down.{i}.downsample.conv.bias"], False)
    # taming decoder: up.{i} indexed by RESOLUTION level (0 = highest),
    # same as our flax naming — no order flip needed
    for i in range(levels):
        for j in range(n_res + 1):
            map_resblock(f"decoder.up.{i}.block.{j}",
                         f"decoder/up_{i}_block_{j}")
            if f"decoder.up.{i}.attn.{j}.norm.weight" in state_dict:
                map_attn(f"decoder.up.{i}.attn.{j}",
                         f"decoder/up_{i}_attn_{j}")
        if f"decoder.up.{i}.upsample.conv.weight" in state_dict:
            put(f"decoder/up_{i}_upsample/conv/kernel",
                state_dict[f"decoder.up.{i}.upsample.conv.weight"], True)
            put(f"decoder/up_{i}_upsample/conv/bias",
                state_dict[f"decoder.up.{i}.upsample.conv.bias"], False)

    for n in ["quant_conv", "post_quant_conv"]:
        put(f"{n}/kernel", state_dict[f"{n}.weight"], True)
        put(f"{n}/bias", state_dict[f"{n}.bias"], False)


def load_klvae_torch_state_dict(params: dict, state_dict: dict) -> dict:
    """Map a taming/CompVis-layout KL-VAE torch state_dict (the published
    SD `first_stage_model` naming) onto KLVAE params."""
    import flax
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)
    _map_compvis_autoencoder(flat, out, state_dict)
    return flax.traverse_util.unflatten_dict(out, sep="/")


def load_taming_torch_state_dict(params: dict, state_dict: dict) -> dict:
    """Map a taming-transformers VQModel torch state_dict (the published
    vqgan_imagenet_f16_* naming: CompVis encoder/decoder with
    intra-level attn + quantize.embedding.weight) onto VQGAN params
    built from taming_config()."""
    import flax
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)
    _map_compvis_autoencoder(flat, out, state_dict)
    cb = np.asarray(state_dict["quantize.embedding.weight"])
    assert cb.shape == flat["codebook"].shape, \
        f"codebook: {cb.shape} vs {flat['codebook'].shape}"
    out["codebook"] = jnp.asarray(cb)
    return flax.traverse_util.unflatten_dict(out, sep="/")
