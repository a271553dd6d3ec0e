"""MAGVITv2 LFQ codec tests: round-trip determinism, id range, LFQ
bit-exactness, and torch-mirror port parity (same pattern as test_vqgan)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from unidisc_tpu.tokenizers.image_codecs import get_codec
from unidisc_tpu.tokenizers.magvit import (MagvitConfig, MagvitLFQ,
                                           load_torch_state_dict)

CFG = dict(bits=6, ch=32, ch_mult=(1, 2), num_res_blocks=1)
SIZE = 16  # f=2 -> 8x8 grid


def test_roundtrip_and_ranges():
    codec = get_codec("magvitv2", image_size=SIZE, **CFG)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, SIZE, SIZE, 3) * 2 - 1, jnp.float32)
    ids = codec.encode(codec.params, imgs)
    assert ids.shape == (2, (SIZE // 2) ** 2)
    assert (np.asarray(ids) >= 0).all()
    assert (np.asarray(ids) < 2 ** CFG["bits"]).all()
    out = codec.decode(codec.params, ids)
    assert out.shape == (2, SIZE, SIZE, 3)
    # deterministic
    np.testing.assert_array_equal(np.asarray(ids),
                                  np.asarray(codec.encode(codec.params, imgs)))


def test_lfq_bits_roundtrip_exact():
    """lookup(quantize(z)) must reproduce sign(z) exactly."""
    model = MagvitLFQ(MagvitConfig(**CFG))
    z = jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, CFG["bits"]),
                    jnp.float32)
    ids = model.quantize(z)
    signs = model.lookup(ids)
    np.testing.assert_array_equal(np.asarray(signs),
                                  np.where(np.asarray(z) > 0, 1.0, -1.0))


# ---------------------------------------------------------------------------
# torch mirror
# ---------------------------------------------------------------------------

def _gn(c):
    return tnn.GroupNorm(min(32, c), c, eps=1e-6)


class TResBlock(tnn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.nin_shortcut = tnn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(tnn.functional.silu(self.norm1(x)))
        h = self.conv2(tnn.functional.silu(self.norm2(h)))
        sc = self.nin_shortcut(x) if self.nin_shortcut is not None else x
        return sc + h


class TMirror(tnn.Module):
    """Torch mirror of MagvitLFQ with matching parameter names."""

    def __init__(self, cfg: MagvitConfig):
        super().__init__()
        self.cfg = cfg
        ch, mults = cfg.ch, cfg.ch_mult
        mods = {}
        mods["conv_in"] = tnn.Conv2d(3, ch, 3, padding=1)
        cin = ch
        for i, m in enumerate(mults):
            for j in range(cfg.num_res_blocks):
                mods[f"down_{i}_block_{j}"] = TResBlock(cin, ch * m)
                cin = ch * m
            if i != len(mults) - 1:
                conv = tnn.Conv2d(cin, cin, 3, stride=2, padding=0)
                holder = tnn.Module()
                holder.conv = conv
                mods[f"down_{i}_downsample"] = holder
        mods["mid_block_1"] = TResBlock(cin, cin)
        mods["mid_block_2"] = TResBlock(cin, cin)
        mods["norm_out"] = _gn(cin)
        mods["conv_out"] = tnn.Conv2d(cin, cfg.bits, 1)
        self.encoder = tnn.ModuleDict(mods)

        dmods = {}
        cin = ch * mults[-1]
        dmods["conv_in"] = tnn.Conv2d(cfg.bits, cin, 3, padding=1)
        dmods["mid_block_1"] = TResBlock(cin, cin)
        dmods["mid_block_2"] = TResBlock(cin, cin)
        for i in reversed(range(len(mults))):
            for j in range(cfg.num_res_blocks + 1):
                dmods[f"up_{i}_block_{j}"] = TResBlock(cin, ch * mults[i])
                cin = ch * mults[i]
            if i != 0:
                conv = tnn.Conv2d(cin, cin, 3, padding=1)
                holder = tnn.Module()
                holder.conv = conv
                dmods[f"up_{i}_upsample"] = holder
        dmods["norm_out"] = _gn(cin)
        dmods["conv_out"] = tnn.Conv2d(cin, 3, 3, padding=1)
        self.decoder = tnn.ModuleDict(dmods)

    def encode(self, x):
        cfg = self.cfg
        e = self.encoder
        h = e["conv_in"](x)
        for i in range(len(cfg.ch_mult)):
            for j in range(cfg.num_res_blocks):
                h = e[f"down_{i}_block_{j}"](h)
            if i != len(cfg.ch_mult) - 1:
                h = tnn.functional.pad(h, (0, 1, 0, 1))
                h = e[f"down_{i}_downsample"].conv(h)
        h = e["mid_block_2"](e["mid_block_1"](h))
        h = tnn.functional.silu(e["norm_out"](h))
        z = e["conv_out"](h)  # (B, bits, h, w)
        w = 2 ** torch.arange(cfg.bits)
        return ((z > 0).long() * w[None, :, None, None]).sum(1)

    def decode(self, ids):
        cfg = self.cfg
        d = self.decoder
        w = 2 ** torch.arange(cfg.bits)
        bits = ((ids.unsqueeze(1) // w[None, :, None, None]) % 2).float()
        z = 2.0 * bits - 1.0
        h = d["conv_in"](z)
        h = d["mid_block_2"](d["mid_block_1"](h))
        for i in reversed(range(len(cfg.ch_mult))):
            for j in range(cfg.num_res_blocks + 1):
                h = d[f"up_{i}_block_{j}"](h)
            if i != 0:
                h = tnn.functional.interpolate(h, scale_factor=2,
                                               mode="nearest")
                h = d[f"up_{i}_upsample"].conv(h)
        h = tnn.functional.silu(d["norm_out"](h))
        return d["conv_out"](h)


def test_torch_mirror_parity():
    cfg = MagvitConfig(**CFG)
    torch.manual_seed(0)
    mirror = TMirror(cfg).eval()

    model = MagvitLFQ(cfg)
    rng = np.random.RandomState(2)
    imgs = rng.rand(2, SIZE, SIZE, 3).astype(np.float32) * 2 - 1
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(imgs))["params"]
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    params = load_torch_state_dict(params, sd)

    with torch.no_grad():
        t_ids = mirror.encode(torch.tensor(imgs).permute(0, 3, 1, 2))
    f_ids = model.apply({"params": params}, jnp.asarray(imgs),
                        method=MagvitLFQ.encode)
    g = SIZE // cfg.downsample
    np.testing.assert_array_equal(
        np.asarray(f_ids), t_ids.numpy().reshape(2, -1))

    with torch.no_grad():
        t_img = mirror.decode(t_ids).permute(0, 2, 3, 1).numpy()
    f_img = np.asarray(model.apply({"params": params}, f_ids, g,
                                   method=MagvitLFQ.decode))
    np.testing.assert_allclose(f_img, t_img, atol=2e-4, rtol=1e-3)
