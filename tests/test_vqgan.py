"""VQGAN codec tests: roundtrip shapes, factory backends, and numerical
parity of the torch-checkpoint port against a torch mirror of LlamaGen's
VQModel layout (reference: unidisc/tokenizers/image_tokenizers.py:51-67)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.tokenizers.image_codecs import get_codec
from unidisc_tpu.tokenizers.vqgan import (VQConfig, VQGAN,
                                          load_torch_state_dict)

TINY = dict(codebook_size=64, codebook_dim=16, ch=32, ch_mult=(1, 2),
            num_res_blocks=1, z_channels=32)


def test_vqgan_roundtrip_shapes():
    cfg = VQConfig(**TINY)
    assert cfg.downsample == 2
    model = VQGAN(cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                              minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]

    ids = model.apply({"params": params}, imgs, method=VQGAN.encode)
    assert ids.shape == (2, 64)  # (16/2)^2
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 64).all()

    recon = model.apply({"params": params}, ids, 8, method=VQGAN.decode)
    assert recon.shape == (2, 16, 16, 3)

    recon2, ids2 = model.apply({"params": params}, imgs)
    assert recon2.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


@pytest.mark.parametrize("name,kw", [
    ("lfq", dict(bits=10, ch=8)),
    ("bsq", dict(bits=10, ch=8)),
    ("cosmos-fsq", dict(levels=(8, 5, 5), ch=8)),
    ("pixels", {}),
    ("dummy", {}),
])
def test_codec_factory_backends(name, kw):
    codec = get_codec(name, image_size=64, **kw)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    ids = codec.encode(codec.params, imgs)
    assert ids.ndim == 2 and ids.shape[0] == 2
    assert (np.asarray(ids) >= 0).all()
    assert (np.asarray(ids) < codec.vocab_size).all()
    recon = codec.decode(codec.params, ids)
    assert recon.shape == (2, 64, 64, 3)


def test_pixels_codec_is_self_consistent():
    codec = get_codec("pixels", image_size=64)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    ids = codec.encode(codec.params, imgs)
    ids2 = codec.encode(codec.params, codec.decode(codec.params, ids))
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_unknown_codec_raises():
    with pytest.raises(ValueError):
        get_codec("nope")
    # "chameleon" names the STREAM pipeline, not an image codec
    with pytest.raises(ValueError, match="STREAM"):
        get_codec("chameleon")


@pytest.mark.parametrize("name,vocab", [
    ("maskgit-vqgan", 64), ("chameleon-vqgan", 64)])
def test_vqgan_preset_backends_roundtrip(name, vocab):
    """MaskGIT-class (pure conv, no quant projections) and Chameleon/Anole
    (taming-layout, stream-codec VQ stage) presets at tiny dims."""
    tiny = dict(codebook_size=vocab, codebook_dim=16, ch=32,
                ch_mult=(1, 2), num_res_blocks=1, z_channels=16)
    codec = get_codec(name, image_size=16, **tiny)
    assert codec.vocab_size == vocab and codec.downsample == 2
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                              minval=-1, maxval=1)
    ids = codec.encode(codec.params, imgs)
    assert ids.shape == (2, 64)
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < vocab).all()
    recon = codec.decode(codec.params, ids)
    assert recon.shape == (2, 16, 16, 3)


def test_maskgit_layout_has_no_attention_or_quant_convs():
    """The MaskGIT layout drops every attention block and the 1x1 quant
    projections: its encoder emits codebook_dim directly."""
    from unidisc_tpu.tokenizers.vqgan import maskgit_config
    cfg = maskgit_config(codebook_size=32, codebook_dim=8, ch=32,
                         ch_mult=(1, 2), num_res_blocks=1, z_channels=8)
    model = VQGAN(cfg)
    imgs = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    assert not any("attn" in n for n in names), names
    assert not any("quant_conv" in n for n in names), names
    enc_out = params["encoder"]["conv_out"]["kernel"]
    assert enc_out.shape[-1] == cfg.codebook_dim


def test_showo_is_magvitv2_alias():
    tiny = dict(bits=6, ch=32, num_res_blocks=1, ch_mult=(1, 2))
    codec = get_codec("showo", image_size=16, **tiny)
    assert codec.name == "magvitv2" and codec.vocab_size == 64


def test_bsq_ids_are_latent_signs_and_corners_unit_norm():
    """BSQ semantics (reference backend: BSQ-18, image_tokenizers.py):
    the id encodes the sign pattern of the (sphere-projected) latent —
    projection cannot move signs — and the decoder consumes corner
    vectors of unit L2 norm."""
    from unidisc_tpu.tokenizers.image_codecs import _conv_trunk
    bits = 10
    codec = get_codec("bsq", image_size=64, bits=bits, ch=8)
    imgs = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    ids = np.asarray(jax.jit(codec.encode)(codec.params, imgs))
    enc, _ = _conv_trunk(bits, 8)
    z = np.asarray(enc.apply({"params": codec.params["enc"]}, imgs))
    weights = 2 ** np.arange(bits)
    want = ((z > 0).astype(np.int64) * weights).sum(-1).reshape(2, -1)
    np.testing.assert_array_equal(ids, want)
    # corner geometry: every decodable code vector has unit norm
    bitsarr = ((ids[..., None] // weights) % 2).astype(np.float64)
    corners = (2.0 * bitsarr - 1.0) / math.sqrt(bits)
    np.testing.assert_allclose(np.linalg.norm(corners, axis=-1), 1.0,
                               atol=1e-12)


def test_fsq_mixed_radix_ids_and_vocab():
    """FSQ semantics (reference backend: NVIDIA Cosmos,
    image_tokenizers.py): vocab is prod(levels); ids decompose into
    per-channel digits below their level counts; encode is
    deterministic and jittable."""
    levels = (8, 5, 5)
    codec = get_codec("cosmos", image_size=64, levels=levels, ch=8)
    assert codec.vocab_size == 8 * 5 * 5
    imgs = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3),
                              minval=-1, maxval=1)
    ids = np.asarray(jax.jit(codec.encode)(codec.params, imgs))
    ids2 = np.asarray(codec.encode(codec.params, imgs))
    np.testing.assert_array_equal(ids, ids2)
    place = np.concatenate([[1], np.cumprod(levels[:-1])])
    digits = (ids[..., None] // place) % np.asarray(levels)
    assert (digits < np.asarray(levels)).all()
    np.testing.assert_array_equal((digits * place).sum(-1), ids)
    recon = jax.jit(codec.decode)(codec.params, jnp.asarray(ids))
    assert recon.shape == (2, 64, 64, 3)
    # default levels are the Cosmos-DI 64000-way code
    assert get_codec("cosmos", image_size=64, ch=8).vocab_size == 64000


# ---------------------------------------------------------------------------
# torch port parity
# ---------------------------------------------------------------------------

def build_torch_vqmodel(cfg: VQConfig):
    """Minimal torch mirror of LlamaGen's VQModel param layout (public
    tokenizer/tokenizer_image/vq_model.py naming)."""
    import torch
    import torch.nn as tnn

    class ResnetBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            if hasattr(self, "nin_shortcut"):
                x = self.nin_shortcut(x)
            return x + h

    class AttnBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(32, c, eps=1e-6)
            self.q = tnn.Conv2d(c, c, 1)
            self.k = tnn.Conv2d(c, c, 1)
            self.v = tnn.Conv2d(c, c, 1)
            self.proj_out = tnn.Conv2d(c, c, 1)

        def forward(self, x):
            y = self.norm(x)
            q, k, v = self.q(y), self.k(y), self.v(y)
            b, c, h, w = q.shape
            q = q.reshape(b, c, h * w).permute(0, 2, 1)
            k = k.reshape(b, c, h * w)
            attn = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=-1)
            v = v.reshape(b, c, h * w).permute(0, 2, 1)
            out = torch.bmm(attn, v).permute(0, 2, 1).reshape(b, c, h, w)
            return x + self.proj_out(out)

    class Down(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(torch.nn.functional.pad(x, (0, 1, 0, 1)))

    class Up(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(torch.nn.functional.interpolate(
                x, scale_factor=2, mode="nearest"))

    class Level(tnn.Module):
        def __init__(self, blocks, resize=None, down=True):
            super().__init__()
            self.res = tnn.ModuleList(blocks)
            if resize is not None:
                setattr(self, "downsample" if down else "upsample", resize)

        def forward(self, x, down=True):
            for r in self.res:
                x = r(x)
            if hasattr(self, "downsample"):
                x = self.downsample(x)
            if hasattr(self, "upsample"):
                x = self.upsample(x)
            return x

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(3, cfg.ch, 3, padding=1)
            levels = []
            cin = cfg.ch
            for i, mult in enumerate(cfg.ch_mult):
                cout = cfg.ch * mult
                blocks = []
                for _ in range(cfg.num_res_blocks):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                resize = Down(cout) if i != len(cfg.ch_mult) - 1 else None
                levels.append(Level(blocks, resize))
            self.conv_blocks = tnn.ModuleList(levels)
            self.mid = tnn.ModuleList([ResnetBlock(cin, cin), AttnBlock(cin),
                                       ResnetBlock(cin, cin)])
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, cfg.z_channels, 3, padding=1)

        def forward(self, x):
            h = self.conv_in(x)
            for lvl in self.conv_blocks:
                h = lvl(h)
            for m in self.mid:
                h = m(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            cin = cfg.ch * cfg.ch_mult[-1]
            self.conv_in = tnn.Conv2d(cfg.z_channels, cin, 3, padding=1)
            self.mid = tnn.ModuleList([ResnetBlock(cin, cin), AttnBlock(cin),
                                       ResnetBlock(cin, cin)])
            levels = []
            for bi, i in enumerate(reversed(range(len(cfg.ch_mult)))):
                cout = cfg.ch * cfg.ch_mult[i]
                blocks = []
                for _ in range(cfg.num_res_blocks + 1):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                resize = Up(cout) if i != 0 else None
                levels.append(Level(blocks, resize, down=False))
            self.conv_blocks = tnn.ModuleList(levels)
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, 3, 3, padding=1)

        def forward(self, z):
            h = self.conv_in(z)
            for m in self.mid:
                h = m(h)
            for lvl in self.conv_blocks:
                h = lvl(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class VQModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quantize = tnn.Module()
            self.quantize.embedding = tnn.Embedding(cfg.codebook_size,
                                                    cfg.codebook_dim)
            self.quant_conv = tnn.Conv2d(cfg.z_channels, cfg.codebook_dim, 1)
            self.post_quant_conv = tnn.Conv2d(cfg.codebook_dim,
                                              cfg.z_channels, 1)

    return VQModel()


def test_torch_port_parity():
    import torch
    torch.manual_seed(0)
    cfg = VQConfig(**TINY)
    tmodel = build_torch_vqmodel(cfg)
    tmodel.eval()

    model = VQGAN(cfg)
    imgs_np = np.random.RandomState(0).uniform(
        -1, 1, (2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(imgs_np))["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = load_torch_state_dict(params, sd)

    # encoder latents parity
    with torch.no_grad():
        t_in = torch.from_numpy(imgs_np).permute(0, 3, 1, 2)
        t_z = tmodel.quant_conv(tmodel.encoder(t_in))
        t_z = t_z.permute(0, 2, 3, 1).numpy()

    def flax_latent(params, imgs):
        m = VQGAN(cfg)

        def run(mdl, imgs):
            return mdl.quant_conv(mdl.encoder(imgs))
        return m.apply({"params": params}, imgs, method=run)

    f_z = np.asarray(flax_latent(params, jnp.asarray(imgs_np)))
    np.testing.assert_allclose(f_z, t_z, atol=1e-4, rtol=1e-3)

    # decoder parity from the same latent ids
    ids = model.apply({"params": params}, jnp.asarray(imgs_np),
                      method=VQGAN.encode)
    f_rec = np.asarray(model.apply({"params": params}, ids, 8,
                                   method=VQGAN.decode))
    with torch.no_grad():
        emb = tmodel.quantize.embedding.weight
        emb = emb / emb.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        zq = emb[torch.from_numpy(np.asarray(ids))].reshape(2, 8, 8, -1)
        zq = zq.permute(0, 3, 1, 2)
        t_rec = tmodel.decoder(tmodel.post_quant_conv(zq))
        t_rec = t_rec.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(f_rec, t_rec, atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Taming VQGAN (CompVis naming, intra-level attention, raw codes)
# ---------------------------------------------------------------------------

TAMING_TINY = dict(codebook_size=64, codebook_dim=16, ch=32,
                   ch_mult=(1, 2), num_res_blocks=1, z_channels=32,
                   l2_norm_codes=False, attn_levels=(1,))


def build_torch_taming(cfg: VQConfig):
    """Torch mirror of the published taming-transformers VQModel naming
    (encoder.down.{i}.block/attn.{j}, decoder.up.{i}.*,
    quantize.embedding) at a tiny config with attention on the
    bottleneck level."""
    import torch
    import torch.nn as tnn

    class ResnetBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            if hasattr(self, "nin_shortcut"):
                x = self.nin_shortcut(x)
            return x + h

    class AttnBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(32, c, eps=1e-6)
            self.q = tnn.Conv2d(c, c, 1)
            self.k = tnn.Conv2d(c, c, 1)
            self.v = tnn.Conv2d(c, c, 1)
            self.proj_out = tnn.Conv2d(c, c, 1)

        def forward(self, x):
            y = self.norm(x)
            q, k, v = self.q(y), self.k(y), self.v(y)
            b, c, h, w = q.shape
            q = q.reshape(b, c, h * w).permute(0, 2, 1)
            k = k.reshape(b, c, h * w)
            attn = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=-1)
            v = v.reshape(b, c, h * w).permute(0, 2, 1)
            out = torch.bmm(attn, v).permute(0, 2, 1).reshape(b, c, h, w)
            return x + self.proj_out(out)

    class Down(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(torch.nn.functional.pad(x, (0, 1, 0, 1)))

    class Up(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(torch.nn.functional.interpolate(
                x, scale_factor=2, mode="nearest"))

    class Level(tnn.Module):
        def __init__(self, blocks, attns, resize=None, down=True):
            super().__init__()
            self.block = tnn.ModuleList(blocks)
            if attns:
                self.attn = tnn.ModuleList(attns)
            if resize is not None:
                setattr(self, "downsample" if down else "upsample", resize)

        def forward(self, x):
            for j, r in enumerate(self.block):
                x = r(x)
                if hasattr(self, "attn"):
                    x = self.attn[j](x)
            if hasattr(self, "downsample"):
                x = self.downsample(x)
            if hasattr(self, "upsample"):
                x = self.upsample(x)
            return x

    class Mid(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.block_1 = ResnetBlock(c, c)
            self.attn_1 = AttnBlock(c)
            self.block_2 = ResnetBlock(c, c)

        def forward(self, x):
            return self.block_2(self.attn_1(self.block_1(x)))

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(3, cfg.ch, 3, padding=1)
            levels, cin = [], cfg.ch
            for i, mult in enumerate(cfg.ch_mult):
                cout = cfg.ch * mult
                blocks, attns = [], []
                for _ in range(cfg.num_res_blocks):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                    if i in cfg.attn_levels:
                        attns.append(AttnBlock(cout))
                resize = Down(cout) if i != len(cfg.ch_mult) - 1 else None
                levels.append(Level(blocks, attns, resize))
            self.down = tnn.ModuleList(levels)
            self.mid = Mid(cin)
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, cfg.z_channels, 3, padding=1)

        def forward(self, x):
            h = self.conv_in(x)
            for lvl in self.down:
                h = lvl(h)
            h = self.mid(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            cin = cfg.ch * cfg.ch_mult[-1]
            self.conv_in = tnn.Conv2d(cfg.z_channels, cin, 3, padding=1)
            self.mid = Mid(cin)
            levels = [None] * len(cfg.ch_mult)
            for i in reversed(range(len(cfg.ch_mult))):
                cout = cfg.ch * cfg.ch_mult[i]
                blocks, attns = [], []
                for _ in range(cfg.num_res_blocks + 1):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                    if i in cfg.attn_levels:
                        attns.append(AttnBlock(cout))
                resize = Up(cout) if i != 0 else None
                levels[i] = Level(blocks, attns, resize, down=False)
            self.up = tnn.ModuleList(levels)
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, 3, 3, padding=1)

        def forward(self, z):
            h = self.mid(self.conv_in(z))
            for lvl in reversed(self.up):
                h = lvl(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class VQModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quantize = tnn.Module()
            self.quantize.embedding = tnn.Embedding(cfg.codebook_size,
                                                    cfg.codebook_dim)
            self.quant_conv = tnn.Conv2d(cfg.z_channels, cfg.codebook_dim,
                                         1)
            self.post_quant_conv = tnn.Conv2d(cfg.codebook_dim,
                                              cfg.z_channels, 1)

    return VQModel()


def test_taming_torch_port_parity():
    """The taming backend (get_codec('taming')): CompVis-named torch
    state_dict with intra-level attention loads via
    load_taming_torch_state_dict and matches the flax VQGAN's encoder
    latents, ids (raw, non-L2-normed codes) and reconstruction."""
    import torch

    from unidisc_tpu.tokenizers.vqgan import load_taming_torch_state_dict
    torch.manual_seed(0)
    cfg = VQConfig(**TAMING_TINY)
    tmodel = build_torch_taming(cfg)
    tmodel.eval()

    model = VQGAN(cfg)
    imgs_np = np.random.RandomState(0).uniform(
        -1, 1, (2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(imgs_np))["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    assert any(".attn." in k for k in sd), "mirror must exercise attn"
    params = load_taming_torch_state_dict(params, sd)

    with torch.no_grad():
        t_in = torch.from_numpy(imgs_np).permute(0, 3, 1, 2)
        t_z = tmodel.quant_conv(tmodel.encoder(t_in))
        t_z_np = t_z.permute(0, 2, 3, 1).numpy()

    def flax_latent(params, imgs):
        def run(mdl, imgs):
            return mdl.quant_conv(mdl.encoder(imgs))
        return VQGAN(cfg).apply({"params": params}, imgs, method=run)

    f_z = np.asarray(flax_latent(params, jnp.asarray(imgs_np)))
    np.testing.assert_allclose(f_z, t_z_np, atol=1e-4, rtol=1e-3)

    # ids: taming nearest-neighbour on RAW codes (no L2 norm)
    ids = model.apply({"params": params}, jnp.asarray(imgs_np),
                      method=VQGAN.encode)
    with torch.no_grad():
        emb = tmodel.quantize.embedding.weight       # raw codes
        zf = t_z.permute(0, 2, 3, 1).reshape(-1, cfg.codebook_dim)
        d = (zf * zf).sum(-1, keepdim=True) - 2 * zf @ emb.T \
            + (emb * emb).sum(-1)
        t_ids = d.argmin(-1).reshape(2, -1).numpy()
    np.testing.assert_array_equal(np.asarray(ids), t_ids)

    # decode parity from the same ids
    f_rec = np.asarray(model.apply({"params": params}, ids, 8,
                                   method=VQGAN.decode))
    with torch.no_grad():
        zq = emb[torch.from_numpy(t_ids)].reshape(2, 8, 8, -1)
        zq = zq.permute(0, 3, 1, 2)
        t_rec = tmodel.decoder(tmodel.post_quant_conv(zq))
        t_rec = t_rec.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(f_rec, t_rec, atol=1e-4, rtol=1e-3)


def test_taming_codec_factory():
    from unidisc_tpu.tokenizers.vqgan import taming_config
    cfg = taming_config()
    assert cfg.downsample == 16 and not cfg.l2_norm_codes
    assert cfg.attn_levels == (4,)
    codec = get_codec("taming", image_size=16, **TAMING_TINY)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                              minval=-1, maxval=1)
    ids = codec.encode(codec.params, imgs)
    assert ids.shape == (2, 64) and codec.vocab_size == 64
    assert codec.decode(codec.params, ids).shape == (2, 16, 16, 3)


# ---------------------------------------------------------------------------
# KL-VAE (continuous sd-vae backend)
# ---------------------------------------------------------------------------

KL_TINY = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
               embed_dim=4)


def test_klvae_roundtrip_and_sampling():
    from unidisc_tpu.tokenizers.vqgan import KLVAE, KLVAEConfig
    cfg = KLVAEConfig(**KL_TINY)
    assert cfg.downsample == 2
    model = KLVAE(cfg)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                              minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]

    z = model.apply({"params": params}, imgs, method=KLVAE.encode)
    assert z.shape == (2, 64, 4)  # (16/2)^2 latents, embed_dim 4
    # deterministic (mean) encode is reproducible; sampled encode differs
    z2 = model.apply({"params": params}, imgs, method=KLVAE.encode)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    zs = model.apply({"params": params}, imgs, jax.random.PRNGKey(3),
                     method=KLVAE.encode)
    assert not np.allclose(np.asarray(z), np.asarray(zs))

    recon = model.apply({"params": params}, z, 8, method=KLVAE.decode)
    assert recon.shape == (2, 16, 16, 3)

    recon2, mean, logvar = model.apply({"params": params}, imgs)
    assert recon2.shape == (2, 16, 16, 3)
    assert mean.shape == logvar.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(logvar)).all()


def test_continuous_codec_factory():
    from unidisc_tpu.tokenizers.image_codecs import get_continuous_codec
    codec = get_continuous_codec("sd-vae", image_size=16, **KL_TINY)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3),
                              minval=-1, maxval=1)
    z = codec.encode(codec.params, imgs)
    assert z.shape == (2, 64, codec.latent_dim)
    out = codec.decode(codec.params, z)
    assert out.shape == (2, 16, 16, 3)
    # the discrete factory points continuous users at this one
    with pytest.raises(ValueError, match="continuous"):
        get_codec("sd-vae")


def build_torch_klvae(cfg):
    """Taming/CompVis-layout torch mirror (the published SD
    first_stage_model naming: encoder.down.{i}.block.{j},
    encoder.mid.block_1/attn_1/block_2, decoder.up.{i})."""
    import torch
    import torch.nn as tnn

    class ResnetBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.norm1 = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
            self.norm2 = tnn.GroupNorm(32, cout, eps=1e-6)
            self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
            if cin != cout:
                self.nin_shortcut = tnn.Conv2d(cin, cout, 1)

        def forward(self, x):
            h = torch.nn.functional.silu(self.norm1(x))
            h = self.conv1(h)
            h = torch.nn.functional.silu(self.norm2(h))
            h = self.conv2(h)
            if hasattr(self, "nin_shortcut"):
                x = self.nin_shortcut(x)
            return x + h

    class AttnBlock(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.norm = tnn.GroupNorm(32, c, eps=1e-6)
            self.q = tnn.Conv2d(c, c, 1)
            self.k = tnn.Conv2d(c, c, 1)
            self.v = tnn.Conv2d(c, c, 1)
            self.proj_out = tnn.Conv2d(c, c, 1)

        def forward(self, x):
            y = self.norm(x)
            q, k, v = self.q(y), self.k(y), self.v(y)
            b, c, h, w = q.shape
            q = q.reshape(b, c, h * w).permute(0, 2, 1)
            k = k.reshape(b, c, h * w)
            attn = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=-1)
            v = v.reshape(b, c, h * w).permute(0, 2, 1)
            out = torch.bmm(attn, v).permute(0, 2, 1).reshape(b, c, h, w)
            return x + self.proj_out(out)

    class Down(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, stride=2, padding=0)

        def forward(self, x):
            return self.conv(torch.nn.functional.pad(x, (0, 1, 0, 1)))

    class Up(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.conv = tnn.Conv2d(c, c, 3, padding=1)

        def forward(self, x):
            return self.conv(torch.nn.functional.interpolate(
                x, scale_factor=2, mode="nearest"))

    class Level(tnn.Module):
        def __init__(self, blocks, resize=None, down=True):
            super().__init__()
            self.block = tnn.ModuleList(blocks)
            if resize is not None:
                setattr(self, "downsample" if down else "upsample", resize)

        def forward(self, x):
            for r in self.block:
                x = r(x)
            if hasattr(self, "downsample"):
                x = self.downsample(x)
            if hasattr(self, "upsample"):
                x = self.upsample(x)
            return x

    class Mid(tnn.Module):
        def __init__(self, c):
            super().__init__()
            self.block_1 = ResnetBlock(c, c)
            self.attn_1 = AttnBlock(c)
            self.block_2 = ResnetBlock(c, c)

        def forward(self, x):
            return self.block_2(self.attn_1(self.block_1(x)))

    class Encoder(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv_in = tnn.Conv2d(3, cfg.ch, 3, padding=1)
            levels, cin = [], cfg.ch
            for i, mult in enumerate(cfg.ch_mult):
                cout = cfg.ch * mult
                blocks = []
                for _ in range(cfg.num_res_blocks):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                resize = Down(cout) if i != len(cfg.ch_mult) - 1 else None
                levels.append(Level(blocks, resize))
            self.down = tnn.ModuleList(levels)
            self.mid = Mid(cin)
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, 2 * cfg.z_channels, 3,
                                       padding=1)

        def forward(self, x):
            h = self.conv_in(x)
            for lvl in self.down:
                h = lvl(h)
            h = self.mid(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class Decoder(tnn.Module):
        def __init__(self):
            super().__init__()
            cin = cfg.ch * cfg.ch_mult[-1]
            self.conv_in = tnn.Conv2d(cfg.z_channels, cin, 3, padding=1)
            self.mid = Mid(cin)
            levels = [None] * len(cfg.ch_mult)
            for i in reversed(range(len(cfg.ch_mult))):
                cout = cfg.ch * cfg.ch_mult[i]
                blocks = []
                for _ in range(cfg.num_res_blocks + 1):
                    blocks.append(ResnetBlock(cin, cout))
                    cin = cout
                resize = Up(cout) if i != 0 else None
                levels[i] = Level(blocks, resize, down=False)
            self.up = tnn.ModuleList(levels)
            self.norm_out = tnn.GroupNorm(32, cin, eps=1e-6)
            self.conv_out = tnn.Conv2d(cin, 3, 3, padding=1)

        def forward(self, z):
            h = self.mid(self.conv_in(z))
            for lvl in reversed(self.up):
                h = lvl(h)
            h = torch.nn.functional.silu(self.norm_out(h))
            return self.conv_out(h)

    class AutoencoderKL(tnn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.quant_conv = tnn.Conv2d(2 * cfg.z_channels,
                                         2 * cfg.embed_dim, 1)
            self.post_quant_conv = tnn.Conv2d(cfg.embed_dim,
                                              cfg.z_channels, 1)

    return AutoencoderKL()


def test_klvae_torch_port_parity():
    import torch

    from unidisc_tpu.tokenizers.vqgan import (KLVAE, KLVAEConfig,
                                              load_klvae_torch_state_dict)
    torch.manual_seed(0)
    cfg = KLVAEConfig(**KL_TINY)
    tmodel = build_torch_klvae(cfg)
    tmodel.eval()

    model = KLVAE(cfg)
    imgs_np = np.random.RandomState(0).uniform(
        -1, 1, (2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(imgs_np))["params"]
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = load_klvae_torch_state_dict(params, sd)

    # posterior-mean latents parity
    with torch.no_grad():
        t_in = torch.from_numpy(imgs_np).permute(0, 3, 1, 2)
        t_m = tmodel.quant_conv(tmodel.encoder(t_in))
        t_mean = t_m[:, :cfg.embed_dim].permute(0, 2, 3, 1).numpy()
    f_mean = np.asarray(model.apply({"params": params},
                                    jnp.asarray(imgs_np),
                                    method=KLVAE.moments)[0])
    np.testing.assert_allclose(f_mean, t_mean, atol=1e-4, rtol=1e-3)

    # decoder parity from the same scaled latents
    z = model.apply({"params": params}, jnp.asarray(imgs_np),
                    method=KLVAE.encode)
    f_rec = np.asarray(model.apply({"params": params}, z, 8,
                                   method=KLVAE.decode))
    with torch.no_grad():
        zt = torch.from_numpy(np.asarray(z)).reshape(2, 8, 8, 4)
        zt = (zt / cfg.scale_factor).permute(0, 3, 1, 2)
        t_rec = tmodel.decoder(tmodel.post_quant_conv(zt))
        t_rec = t_rec.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(f_rec, t_rec, atol=1e-4, rtol=1e-3)
