"""Image codec factory: one API over multiple tokenizer backends.

Redesign of the reference's `get_vae` 12-backend mux
(reference: unidisc/tokenizers/image_tokenizers.py:20-187) for TPU: each
codec is a pair of jittable functions (encode images->ids, decode
ids->images) plus a param tree, so codecs compose with pjit/scan like any
other JAX computation.

Implemented natively: LlamaGen VQ-16/VQ-8 (production codec, Flax convs),
Open-MAGVIT2-style LFQ, BSQ-18 (binary spherical quantization),
Cosmos-style FSQ (finite scalar quantization, mixed-radix ids),
MAGVITv2 (= the Show-o backend), TiTok-1D, Taming VQGAN (CompVis naming
+ intra-level attention), MaskGIT-class pure-conv VQGAN,
Chameleon/Anole/Lumina VQ stage (pairs with the stream codec in
tokenizers/chameleon.py), a VideoGPT-style video VQVAE
(get_video_codec), raw pixels, a deterministic dummy codec for tests,
and the SD KL-VAE continuous codec (get_continuous_codec) — the full
12-backend surface of the reference's get_vae mux (whose snapshot ships
NO model code for maskgit/taming/chameleon; those are external
packages there).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.tokenizers.vqgan import (VQConfig, VQGAN, chameleon_config,
                                          maskgit_config, taming_config,
                                          vq8_config)


class ImageCodec(NamedTuple):
    name: str
    params: Any
    encode: Callable  # (params, images (B,H,W,3) in [-1,1]) -> ids (B, T)
    decode: Callable  # (params, ids (B, T)) -> images (B,H,W,3)
    vocab_size: int
    downsample: int   # tokens per side = H // downsample


class ContinuousCodec(NamedTuple):
    """Continuous-latent codec (the reference's SD-VAE backend) for the
    transfusion/continuous branch (models/continuous.py): encode returns
    float latents (B, T, latent_dim) instead of token ids."""
    name: str
    params: Any
    encode: Callable  # (params, images, rng=None) -> latents (B, T, C)
    decode: Callable  # (params, latents (B, T, C)) -> images
    latent_dim: int
    downsample: int


# ---------------------------------------------------------------------------
# LlamaGen VQGAN
# ---------------------------------------------------------------------------

def _make_vqgan(cfg: VQConfig, rng, image_size: int, name: str) -> ImageCodec:
    model = VQGAN(cfg)
    grid = image_size // cfg.downsample
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = model.init(rng, dummy)["params"]

    def encode(params, images):
        return model.apply({"params": params}, images, method=VQGAN.encode)

    def decode(params, ids):
        return model.apply({"params": params}, ids, grid,
                           method=VQGAN.decode)

    return ImageCodec(name=name, params=params, encode=encode, decode=decode,
                      vocab_size=cfg.codebook_size, downsample=cfg.downsample)


# ---------------------------------------------------------------------------
# LFQ (Open-MAGVIT2-style lookup-free quantization)
# ---------------------------------------------------------------------------

def _conv_trunk(latent_dim: int, ch: int = 64):
    """Shared lightweight 16x conv encoder/decoder pair used by the
    sign/level-quantizer codecs (LFQ / BSQ / FSQ): the codecs differ only
    in how the (B, g, g, latent_dim) latent is quantized into ids."""
    import flax.linen as nn

    class TrunkEncoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = x
            for i, mult in enumerate([1, 2, 4, 4]):
                h = nn.Conv(ch * mult, (4, 4), strides=2, padding=1,
                            name=f"down_{i}")(h)
                h = nn.gelu(h)
            return nn.Conv(latent_dim, (1, 1), name="to_bits")(h)

    class TrunkDecoder(nn.Module):
        @nn.compact
        def __call__(self, z):
            h = nn.Conv(ch * 4, (1, 1), name="from_bits")(z)
            for i, mult in enumerate([4, 4, 2, 1]):
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), "nearest")
                h = nn.Conv(ch * mult, (3, 3), padding=1, name=f"up_{i}")(h)
                h = nn.gelu(h)
            return nn.Conv(3, (3, 3), padding=1, name="to_rgb")(h)

    return TrunkEncoder(), TrunkDecoder()


def _init_trunk(enc, dec, rng, image_size: int, latent_dim: int):
    grid = image_size // 16
    k1, k2 = jax.random.split(rng)
    p_enc = enc.init(k1, jnp.zeros((1, image_size, image_size, 3)))["params"]
    p_dec = dec.init(k2, jnp.zeros((1, grid, grid, latent_dim)))["params"]
    return {"enc": p_enc, "dec": p_dec}


def _make_lfq(rng, image_size: int, bits: int = 14, ch: int = 64) -> ImageCodec:
    """Lookup-free quantization: the latent's sign pattern IS the token id
    (reference capability: Open-MAGVIT2 LFQ backend, image_tokenizers.py).
    Lightweight conv encoder/decoder; codebook size = 2^bits."""
    enc, dec = _conv_trunk(bits, ch)
    params = _init_trunk(enc, dec, rng, image_size, bits)
    weights = 2 ** jnp.arange(bits)

    def encode(params, images):
        z = enc.apply({"params": params["enc"]}, images)
        ids = jnp.sum((z > 0).astype(jnp.int32) * weights, axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def decode(params, ids):
        g = int(math.isqrt(ids.shape[-1]))
        bitsarr = ((ids[..., None] // weights) % 2).astype(jnp.float32)
        z = (2.0 * bitsarr - 1.0).reshape(ids.shape[0], g, g, bits)
        return dec.apply({"params": params["dec"]}, z)

    return ImageCodec(name="lfq", params=params, encode=encode, decode=decode,
                      vocab_size=2 ** bits, downsample=16)


def _make_bsq(rng, image_size: int, bits: int = 18, ch: int = 64) -> ImageCodec:
    """Binary spherical quantization (reference capability: the BSQ-18
    backend, image_tokenizers.py — BSQ-ViT, arXiv 2406.07548): the latent
    is L2-normalized onto the unit sphere and quantized to the nearest of
    the 2^bits corners +/- 1/sqrt(bits), so the code vector also lies on
    the sphere. The sign pattern is the token id (for unit-norm z, the
    nearest corner IS sign(z)/sqrt(bits)); the decoder reads the corner
    vector, keeping the quantization error bounded by the sphere geometry
    rather than the latent scale."""
    enc, dec = _conv_trunk(bits, ch)
    params = _init_trunk(enc, dec, rng, image_size, bits)
    weights = 2 ** jnp.arange(bits)
    inv_sqrt_d = 1.0 / math.sqrt(bits)

    def encode(params, images):
        z = enc.apply({"params": params["enc"]}, images)
        # normalization does not move signs, so the id needs only them
        ids = jnp.sum((z > 0).astype(jnp.int32) * weights, axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def decode(params, ids):
        g = int(math.isqrt(ids.shape[-1]))
        bitsarr = ((ids[..., None] // weights) % 2).astype(jnp.float32)
        corner = (2.0 * bitsarr - 1.0) * inv_sqrt_d  # unit-norm corner
        z = corner.reshape(ids.shape[0], g, g, bits)
        return dec.apply({"params": params["dec"]}, z)

    return ImageCodec(name="bsq", params=params, encode=encode,
                      decode=decode, vocab_size=2 ** bits, downsample=16)


def _make_fsq(rng, image_size: int, levels: tuple = (8, 8, 8, 5, 5, 5),
              ch: int = 64) -> ImageCodec:
    """Finite scalar quantization (reference capability: the NVIDIA Cosmos
    DI backend, image_tokenizers.py — Cosmos tokenizers quantize with FSQ,
    arXiv 2309.15505): each latent channel is bounded with tanh to
    [-(L-1)/2, (L-1)/2], rounded to integer levels, and the per-channel
    digits form one mixed-radix token id. Default levels (8,8,8,5,5,5)
    match Cosmos-DI's 64000-way vocabulary."""
    levels = tuple(int(l) for l in levels)
    dim = len(levels)
    enc, dec = _conv_trunk(dim, ch)
    params = _init_trunk(enc, dec, rng, image_size, dim)
    lv = jnp.asarray(levels, jnp.float32)
    half = (lv - 1.0) / 2.0
    # mixed-radix place values: id = sum_i digit_i * prod_{j<i} L_j
    place = jnp.asarray(np.concatenate([[1], np.cumprod(levels[:-1])]),
                        jnp.int32)
    vocab = int(np.prod(levels))

    def _bound(z):
        return jnp.tanh(z) * half  # (..., dim) in [-half, half]

    def encode(params, images):
        z = enc.apply({"params": params["enc"]}, images)
        digits = jnp.round(_bound(z) + half).astype(jnp.int32)
        digits = jnp.clip(digits, 0, (lv - 1).astype(jnp.int32))
        ids = jnp.sum(digits * place, axis=-1)
        return ids.reshape(ids.shape[0], -1)

    def decode(params, ids):
        g = int(math.isqrt(ids.shape[-1]))
        digits = (ids[..., None] // place) % lv.astype(jnp.int32)
        # normalize each channel back to [-1, 1] for the decoder
        z = (digits.astype(jnp.float32) - half) / half
        z = z.reshape(ids.shape[0], g, g, dim)
        return dec.apply({"params": params["dec"]}, z)

    return ImageCodec(name="cosmos-fsq", params=params, encode=encode,
                      decode=decode, vocab_size=vocab, downsample=16)


# ---------------------------------------------------------------------------
# Raw pixels & dummy
# ---------------------------------------------------------------------------

def _make_pixels(image_size: int, pixel_grid: int = 16) -> ImageCodec:
    """Raw-pixel codec: average-pool to a grid, 8-bit-quantize luminance+color
    into one id per cell (reference 'pixels' backend)."""
    down = image_size // pixel_grid

    def encode(params, images):
        b = images.shape[0]
        x = images.reshape(b, pixel_grid, down, pixel_grid, down, 3)
        x = x.mean(axis=(2, 4))  # (B, g, g, 3)
        q = jnp.clip(((x + 1) / 2 * 7.999).astype(jnp.int32), 0, 7)
        ids = q[..., 0] * 64 + q[..., 1] * 8 + q[..., 2]
        return ids.reshape(b, -1)

    def decode(params, ids):
        b = ids.shape[0]
        g = int(math.isqrt(ids.shape[-1]))
        r, rem = ids // 64, ids % 64
        rgb = jnp.stack([r, rem // 8, rem % 8], axis=-1)
        x = (rgb.astype(jnp.float32) / 7.0) * 2 - 1
        x = x.reshape(b, g, g, 1, 1, 3)
        x = jnp.broadcast_to(x, (b, g, g, down, down, 3))
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, g * down, g * down, 3)

    return ImageCodec(name="pixels", params={}, encode=encode, decode=decode,
                      vocab_size=512, downsample=down)


def _make_dummy(image_size: int, vocab: int = 16384) -> ImageCodec:
    """Deterministic hash codec for tests (reference dummy-data path)."""
    down = 16

    def encode(params, images):
        b = images.shape[0]
        g = image_size // down
        x = images.reshape(b, g, down, g, down, 3).mean((2, 4)).sum(-1)
        return (jnp.abs(x * 1e4).astype(jnp.int32) % vocab).reshape(b, -1)

    def decode(params, ids):
        b = ids.shape[0]
        g = int(math.isqrt(ids.shape[-1]))
        x = (ids.astype(jnp.float32) / vocab) * 2 - 1
        x = jnp.repeat(jnp.repeat(x.reshape(b, g, g, 1), down, 1), down, 2)
        return jnp.broadcast_to(x, (b, g * down, g * down, 3))

    return ImageCodec(name="dummy", params={}, encode=encode, decode=decode,
                      vocab_size=vocab, downsample=down)


# ---------------------------------------------------------------------------
# MAGVITv2 (Show-o LFQ VQGAN) and TiTok 1D tokenizer
# ---------------------------------------------------------------------------

def _make_magvit(rng, image_size: int, **kw) -> ImageCodec:
    """MAGVITv2 LFQ conv tokenizer (reference: image_tokenizers.py:166-187,
    showlab/magvitv2 — the small-scale-config codec)."""
    from unidisc_tpu.tokenizers.magvit import MagvitConfig, MagvitLFQ
    cfg = MagvitConfig(**kw)
    model = MagvitLFQ(cfg)
    grid = image_size // cfg.downsample
    params = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))[
        "params"]

    def encode(params, images):
        return model.apply({"params": params}, images, method=MagvitLFQ.encode)

    def decode(params, ids):
        g = int(math.isqrt(ids.shape[-1]))
        return model.apply({"params": params}, ids, g,
                           method=MagvitLFQ.decode)

    return ImageCodec(name="magvitv2", params=params, encode=encode,
                      decode=decode, vocab_size=cfg.codebook_size,
                      downsample=cfg.downsample)


def _make_titok(name: str, rng, image_size: int, **kw) -> ImageCodec:
    """TiTok 1D tokenizer (reference: image_tokenizers.py:126-141). NOTE:
    tokens are a 1D latent sequence (64/128/256), not a spatial grid —
    `downsample` is reported as image_size/sqrt(K) equivalent for layout
    bookkeeping only."""
    from unidisc_tpu.tokenizers.titok import TiTok, titok_preset
    cfg = titok_preset(name, image_size=image_size, **kw)
    model = TiTok(cfg)
    params = model.init(rng, jnp.zeros((1, image_size, image_size, 3)))[
        "params"]

    def encode(params, images):
        return model.apply({"params": params}, images, method=TiTok.encode)

    def decode(params, ids):
        return model.apply({"params": params}, ids, method=TiTok.decode)

    eq_down = max(1, int(image_size / math.sqrt(cfg.num_latent_tokens)))
    return ImageCodec(name=name, params=params, encode=encode,
                      decode=decode, vocab_size=cfg.codebook_size,
                      downsample=eq_down)


class VideoCodec(NamedTuple):
    """Video codec (the reference's video-VQVAE backend): encode takes
    clips (B, T, H, W, 3) in [-1, 1] and returns time-major ids."""
    name: str
    params: Any
    encode: Callable  # (params, clips (B,T,H,W,3)) -> ids (B, T'*H'*W')
    decode: Callable  # (params, ids) -> clips (B,T,H,W,3)
    vocab_size: int
    downsample: int   # spatial AND temporal factor


def get_video_codec(name: str = "video-vqvae", *, rng=None,
                    frames: int = 16, image_size: int = 64,
                    **kw) -> VideoCodec:
    """Video codec factory — VideoGPT/Open-Sora-Plan-style 3D-conv VQVAE
    (reference: image_tokenizers.py video branch), native Flax
    (tokenizers/video.py)."""
    from unidisc_tpu.tokenizers.video import VideoVQConfig, VideoVQVAE
    if name not in ("video-vqvae", "video"):
        raise ValueError(f"unknown video codec {name!r}")
    cfg = VideoVQConfig(**kw)
    model = VideoVQVAE(cfg)
    d = cfg.downsample
    t_grid, s_grid = frames // d, image_size // d
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, frames, image_size, image_size, 3), jnp.float32)
    params = model.init(rng, dummy)["params"]

    def encode(params, clips):
        return model.apply({"params": params}, clips,
                           method=VideoVQVAE.encode)

    def decode(params, ids):
        return model.apply({"params": params}, ids, t_grid, s_grid,
                           method=VideoVQVAE.decode)

    return VideoCodec(name="video-vqvae", params=params, encode=encode,
                      decode=decode, vocab_size=cfg.codebook_size,
                      downsample=d)


def get_continuous_codec(name: str = "sd-vae", *, rng=None,
                         image_size: int = 256, **kw) -> ContinuousCodec:
    """Continuous (KL-VAE) codec factory — the reference's SD-VAE backend
    (image_tokenizers.py "stable_diffusion"), native Flax
    (tokenizers/vqgan.py KLVAE). Published SD first_stage checkpoints
    load via load_klvae_torch_state_dict (taming naming)."""
    from unidisc_tpu.tokenizers.vqgan import KLVAE, KLVAEConfig
    if name not in ("sd-vae", "klvae"):
        raise ValueError(f"unknown continuous codec {name!r}")
    cfg = KLVAEConfig(**kw)
    model = KLVAE(cfg)
    grid = image_size // cfg.downsample
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    params = model.init(rng, dummy)["params"]

    def encode(params, images, rng=None):
        return model.apply({"params": params}, images, rng,
                           method=KLVAE.encode)

    def decode(params, latents):
        return model.apply({"params": params}, latents, grid,
                           method=KLVAE.decode)

    return ContinuousCodec(name="sd-vae", params=params, encode=encode,
                           decode=decode, latent_dim=cfg.embed_dim,
                           downsample=cfg.downsample)


def get_codec(name: str, *, rng=None, image_size: int = 256,
              **kw) -> ImageCodec:
    """Codec factory (reference: image_tokenizers.py:20 get_vae)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    if name in ("llamagen-vq16", "vq16", "llamagen"):
        return _make_vqgan(VQConfig(**kw), rng, image_size, "llamagen-vq16")
    if name in ("llamagen-vq8", "vq8"):
        return _make_vqgan(vq8_config(**kw), rng, image_size, "llamagen-vq8")
    if name == "taming":
        # published taming checkpoints load via
        # vqgan.load_taming_torch_state_dict (CompVis naming)
        return _make_vqgan(taming_config(**kw), rng, image_size, "taming")
    if name in ("maskgit-vqgan", "maskgit"):
        # MaskGIT-class pure-conv f16 VQGAN (codebook 1024, no quant
        # projections); foreign-named published weights load via the
        # structural auto-remap (tokenizers/remap.py)
        return _make_vqgan(maskgit_config(**kw), rng, image_size,
                           "maskgit-vqgan")
    if name in ("chameleon-vqgan", "anole", "lumina"):
        # the VQ stage under the chameleon/anole/lumina STREAM tokenizers
        # (Lumina-mGPT reuses Chameleon's VQ model); pair with the native
        # stream codec in tokenizers/chameleon.py for the full pipeline
        return _make_vqgan(chameleon_config(**kw), rng, image_size,
                           "chameleon-vqgan")
    if name in ("showo", "show-o"):
        # the reference's Show-o backend IS a MAGVITv2 LFQ tokenizer
        # (image_tokenizers.py:166-187) — alias of the native magvit codec
        return _make_magvit(rng, image_size, **kw)
    if name == "lfq":
        return _make_lfq(rng, image_size, **kw)
    if name in ("bsq", "bsq18"):
        return _make_bsq(rng, image_size, **kw)
    if name in ("cosmos", "cosmos-fsq", "fsq"):
        return _make_fsq(rng, image_size, **kw)
    if name in ("magvit", "magvitv2"):
        return _make_magvit(rng, image_size, **kw)
    if name.startswith("titok"):
        return _make_titok(name, rng, image_size, **kw)
    if name == "pixels":
        return _make_pixels(image_size, **kw)
    if name == "dummy":
        return _make_dummy(image_size, **kw)
    if name in ("sd-vae", "klvae"):
        raise ValueError(
            "sd-vae is a CONTINUOUS codec (float latents, no token ids) — "
            "use get_continuous_codec('sd-vae') with the "
            "transfusion/continuous branch (models/continuous.py)")
    if name in ("video-vqvae", "video"):
        raise ValueError(
            "video-vqvae takes clips (B, T, H, W, 3), not images — use "
            "get_video_codec('video-vqvae')")
    if name == "chameleon":
        raise ValueError(
            "'chameleon' names the STREAM tokenizer (var-aspect crops, "
            "grid/newline tokens) — build a ChameleonSpec over an image "
            "codec (tokenizers/chameleon.py), e.g. "
            "get_codec('chameleon-vqgan') for the Anole-style VQ stage")
    raise ValueError(f"unknown codec {name!r}")


def load_vqgan_torch_checkpoint(codec: ImageCodec, path: str) -> ImageCodec:
    """Load a published LlamaGen torch checkpoint (e.g. vq_ds16_c2i.pt)
    into a llamagen codec."""
    import torch

    from unidisc_tpu.tokenizers.vqgan import load_torch_state_dict
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = ckpt.get("model", ckpt.get("state_dict", ckpt))
    state_dict = {k: v.numpy() for k, v in state_dict.items()}
    params = load_torch_state_dict(codec.params, state_dict)
    return codec._replace(params=params)
