"""Checkpoint-port parity: a torch mirror of the reference DDiT forward
(reference: models/dit.py:890-1500 semantics — weight-only fp32 norms,
image-only adaLN modulation/gating, full-width QK-norm, sandwich norm,
GPT-NeoX rope) produces a state_dict in reference naming; porting it into
the Flax DIT must reproduce the logits."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.models.port import port_dit_state_dict
from unidisc_tpu.models.rotary import rope_1d

B, TXT, IMG = 2, 8, 16
L = TXT + IMG
H, HD = 2, 16
DIM = H * HD
COND = 24
VOCAB = 40


def cfg():
    return Config.make("tiny").override(**{
        "model.hidden_size": DIM, "model.n_heads": H, "model.cond_dim": COND,
        "model.n_blocks": 2, "model.length": L, "model.txt_length": TXT,
        "model.img_length": IMG, "model.text_vocab_size": 20,
        "model.image_vocab_size": 20, "model.dropout": 0.0,
        "model.time_conditioning": True, "model.qk_norm": True,
        "model.sandwich_normalization": True, "model.modality_embed": True,
        "model.norm_type": "rms", "model.zero_linear_init": False,
        "model.rope_2d": False,
    })


class TorchNorm(tnn.Module):
    """Weight-only RMSNorm in fp32 (reference get_norm)."""

    def __init__(self, dim):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(dim))

    def forward(self, x):
        x32 = x.float()
        y = x32 * torch.rsqrt(x32.pow(2).mean(-1, keepdim=True) + 1e-6)
        return y * self.weight


def apply_rope_torch(x, cos, sin):
    # x: (B, L, H, D); cos/sin: (L, D//2); GPT-NeoX half rotation
    d2 = cos.shape[-1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    x1, x2 = x[..., :d2], x[..., d2:2 * d2]
    return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s, x[..., 2 * d2:]], -1)


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = TorchNorm(DIM)
        self.norm2 = TorchNorm(DIM)
        self.attn_qkv = tnn.Linear(DIM, 3 * DIM, bias=False)
        self.attn_out = tnn.Linear(DIM, DIM, bias=False)
        self.q_norm = tnn.LayerNorm(DIM)
        self.k_norm = tnn.LayerNorm(DIM)
        self.adaLN_modulation = tnn.Linear(COND, 6 * DIM)
        self.mlp = tnn.Sequential(tnn.Linear(DIM, 4 * DIM),
                                  tnn.GELU(approximate="tanh"),
                                  tnn.Linear(4 * DIM, DIM))
        self.pre_residual_norm = TorchNorm(DIM)
        self.post_ff_norm = TorchNorm(DIM)

    def forward(self, x, c, cos, sin, modality):
        img = (modality == 1)[..., None]
        cond = self.adaLN_modulation(c)[:, None, :]
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = cond.chunk(6, -1)

        def modulate(h, shift, scale):
            return torch.where(img, h * (1 + scale) + shift, h)

        h = modulate(self.norm1(x), sh_msa, sc_msa)
        qkv = self.attn_qkv(h)
        qkv = torch.cat([self.q_norm(qkv[..., :DIM]),
                         self.k_norm(qkv[..., DIM:2 * DIM]),
                         qkv[..., 2 * DIM:]], -1)
        q, k, v = qkv.reshape(x.shape[0], L, 3, H, HD).unbind(2)
        q = apply_rope_torch(q, cos, sin)
        k = apply_rope_torch(k, cos, sin)
        attn = torch.softmax(
            torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(HD), -1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(
            x.shape[0], L, DIM)
        o = self.attn_out(o)
        # sandwich: pre-residual norm replaces the attention gate
        x = x + self.pre_residual_norm(o)

        h = self.mlp(modulate(self.norm2(x), sh_mlp, sc_mlp))
        h = self.post_ff_norm(h)
        # gated residual, image-only gate (text gets raw out)
        x = x + torch.where(img, g_mlp * h, h)
        return x


class TorchDIT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.vocab_embed = tnn.Module()
        self.vocab_embed.embedding = tnn.Parameter(
            torch.randn(VOCAB, DIM) * 0.02)
        self.modality_embed = tnn.Module()
        self.modality_embed.embedding = tnn.Parameter(
            torch.randn(2, DIM) * 0.02)
        self.sigma_map = tnn.Module()
        self.sigma_map.mlp = tnn.Sequential(
            tnn.Linear(256, COND), tnn.SiLU(), tnn.Linear(COND, COND))
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(2)])
        self.output_layer = tnn.Module()
        self.output_layer.norm_final = TorchNorm(DIM)
        self.output_layer.adaLN_modulation = tnn.Linear(COND, 2 * DIM)
        self.output_layer.linear = tnn.Linear(DIM, VOCAB)

    def forward(self, ids, sigma, modality):
        x = self.vocab_embed.embedding[ids]
        x = x + self.modality_embed.embedding[modality]
        half = 128
        freqs = torch.exp(-math.log(10000) *
                          torch.arange(half).float() / half)
        args = sigma[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], -1)
        c = torch.nn.functional.silu(self.sigma_map.mlp(emb))

        cos_np, sin_np = rope_1d(L, HD)
        cos = torch.from_numpy(cos_np)
        sin = torch.from_numpy(sin_np)
        for blk in self.blocks:
            x = blk(x, c, cos, sin, modality)

        img = (modality == 1)[..., None]
        h = self.output_layer.norm_final(x)
        sh, sc = self.output_layer.adaLN_modulation(c)[:, None, :].chunk(2, -1)
        h = torch.where(img, h * (1 + sc) + sh, h)
        return self.output_layer.linear(h.float())


def test_port_parity():
    torch.manual_seed(0)
    tmodel = TorchDIT().eval()
    config = cfg()
    model, params = init_dit(jax.random.PRNGKey(0), config.model,
                             compute_dtype=jnp.float32)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = port_dit_state_dict(params, sd)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, VOCAB, (B, L)).astype(np.int64)
    modality = np.concatenate([np.zeros((B, TXT)), np.ones((B, IMG))],
                              1).astype(np.int64)
    sigma = np.asarray([0.3, 0.9], np.float32)

    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(ids),
                          torch.from_numpy(sigma),
                          torch.from_numpy(modality)).numpy()

    f_logits = np.asarray(model.apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.asarray(sigma), modality=jnp.asarray(modality, jnp.int32)))

    np.testing.assert_allclose(f_logits, t_logits, atol=2e-4, rtol=1e-3)


def test_port_strict_flags_unknown_keys():
    config = cfg()
    model, params = init_dit(jax.random.PRNGKey(0), config.model)
    tmodel = TorchDIT()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    sd["blocks.0.some_new_thing.weight"] = np.zeros(3)
    with pytest.raises(AssertionError, match="unmapped"):
        port_dit_state_dict(params, sd)
