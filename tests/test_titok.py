"""TiTok 1D tokenizer tests: round-trip shapes/determinism, 1D-latent
semantics, and torch-mirror port parity."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from unidisc_tpu.tokenizers.image_codecs import get_codec
from unidisc_tpu.tokenizers.titok import (TiTok, TiTokConfig,
                                          load_torch_state_dict)

CFG = TiTokConfig(num_latent_tokens=4, codebook_size=32, codebook_dim=8,
                  hidden_size=32, n_layers=2, n_heads=2, patch_size=8,
                  image_size=16)


def test_roundtrip_shapes_and_determinism():
    codec = get_codec("titok64", image_size=256)  # preset wiring check
    assert codec.vocab_size == 4096

    model = TiTok(CFG)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(2, 16, 16, 3) * 2 - 1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    ids = model.apply({"params": params}, imgs, method=TiTok.encode)
    assert ids.shape == (2, CFG.num_latent_tokens)  # 1D latent sequence
    assert (np.asarray(ids) >= 0).all() and \
        (np.asarray(ids) < CFG.codebook_size).all()
    out = model.apply({"params": params}, ids, method=TiTok.decode)
    assert out.shape == (2, 16, 16, 3)
    ids2 = model.apply({"params": params}, imgs, method=TiTok.encode)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


# ---------------------------------------------------------------------------
# torch mirror
# ---------------------------------------------------------------------------

class TBlock(tnn.Module):
    def __init__(self, hid, heads, mlp_ratio):
        super().__init__()
        self.norm1 = tnn.LayerNorm(hid)
        self.attn = tnn.MultiheadAttention(hid, heads, batch_first=True)
        self.norm2 = tnn.LayerNorm(hid)
        self.mlp_0 = tnn.Linear(hid, mlp_ratio * hid)
        self.mlp_2 = tnn.Linear(mlp_ratio * hid, hid)

    def forward(self, x):
        h = self.norm1(x)
        h, _ = self.attn(h, h, h, need_weights=False)
        x = x + h
        h = self.norm2(x)
        h = self.mlp_2(tnn.functional.gelu(self.mlp_0(h)))
        return x + h


class TTiTok(tnn.Module):
    def __init__(self, c: TiTokConfig):
        super().__init__()
        self.c = c
        self.patch_embed = tnn.Conv2d(3, c.hidden_size, c.patch_size,
                                      stride=c.patch_size)
        n = c.grid * c.grid + c.num_latent_tokens
        self.enc_pos = tnn.Parameter(torch.randn(n, c.hidden_size) * 0.02)
        self.latent_tokens = tnn.Parameter(
            torch.randn(c.num_latent_tokens, c.hidden_size) * 0.02)
        self.encoder = tnn.ModuleList(
            [TBlock(c.hidden_size, c.n_heads, c.mlp_ratio)
             for _ in range(c.n_layers)])
        self.enc_norm = tnn.LayerNorm(c.hidden_size)
        self.to_code = tnn.Linear(c.hidden_size, c.codebook_dim)
        self.codebook = tnn.Parameter(
            torch.rand(c.codebook_size, c.codebook_dim))
        self.from_code = tnn.Linear(c.codebook_dim, c.hidden_size)
        self.mask_token = tnn.Parameter(torch.randn(c.hidden_size) * 0.02)
        self.dec_pos = tnn.Parameter(torch.randn(n, c.hidden_size) * 0.02)
        self.decoder = tnn.ModuleList(
            [TBlock(c.hidden_size, c.n_heads, c.mlp_ratio)
             for _ in range(c.n_layers)])
        self.dec_norm = tnn.LayerNorm(c.hidden_size)
        self.to_pixels = tnn.Linear(c.hidden_size,
                                    c.patch_size * c.patch_size * 3)

    def codes(self):
        cb = self.codebook
        return cb / cb.norm(dim=-1, keepdim=True).clamp_min(1e-8)

    def encode(self, x):
        c = self.c
        b = x.shape[0]
        p = self.patch_embed(x).flatten(2).transpose(1, 2)
        lat = self.latent_tokens[None].expand(b, -1, -1)
        h = torch.cat([p, lat], 1) + self.enc_pos[None]
        for blk in self.encoder:
            h = blk(h)
        z = self.to_code(self.enc_norm(h[:, -c.num_latent_tokens:]))
        z = z / z.norm(dim=-1, keepdim=True).clamp_min(1e-8)
        cb = self.codes()
        logits = 2 * z @ cb.T - (cb ** 2).sum(-1)
        return logits.argmax(-1)

    def decode(self, ids):
        c = self.c
        b = ids.shape[0]
        zq = self.codes()[ids]
        lat = self.from_code(zq)
        masks = self.mask_token[None, None].expand(b, c.grid * c.grid, -1)
        h = torch.cat([masks, lat], 1) + self.dec_pos[None]
        for blk in self.decoder:
            h = blk(h)
        pix = self.to_pixels(self.dec_norm(h[:, :c.grid * c.grid]))
        g, p = c.grid, c.patch_size
        pix = pix.reshape(b, g, g, p, p, 3)
        return pix.permute(0, 1, 3, 2, 4, 5).reshape(b, g * p, g * p, 3)


def _torch_sd(mirror):
    sd = {}
    for k, v in mirror.state_dict().items():
        k = k.replace("encoder.", "encoder.").replace("decoder.", "decoder.")
        sd[k] = v.detach().numpy()
    return sd


def test_torch_mirror_parity():
    torch.manual_seed(0)
    mirror = TTiTok(CFG).eval()
    model = TiTok(CFG)
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    params = load_torch_state_dict(params, _torch_sd(mirror), CFG.n_layers)

    with torch.no_grad():
        t_ids = mirror.encode(torch.tensor(imgs).permute(0, 3, 1, 2))
    f_ids = model.apply({"params": params}, jnp.asarray(imgs),
                        method=TiTok.encode)
    np.testing.assert_array_equal(np.asarray(f_ids), t_ids.numpy())

    with torch.no_grad():
        t_img = mirror.decode(t_ids).numpy()
    f_img = np.asarray(model.apply({"params": params}, f_ids,
                                   method=TiTok.decode))
    np.testing.assert_allclose(f_img, t_img, atol=3e-4, rtol=1e-3)
