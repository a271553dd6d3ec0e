"""Judge network architectures for the offline asset drop.

The reference scores generations with three external networks whose
published weight FILES are plain state_dicts — without the architecture
code a dropped asset cannot load (round-2 VERDICT finding). This module
provides eval-only torch implementations whose parameter names match the
published checkpoints exactly:

  * FIDInceptionV3 — pytorch-fid's modified torchvision InceptionV3
    (`pt_inception-2015-12-05.pt`, torchvision key layout, 1008-class
    fc, FID pooling quirks). Reference judge: model_eval.py:1275-1499.
  * OpenClipModel — an open_clip-compatible CLIP (ViT tower + text
    tower, `visual.transformer.resblocks.*` key layout) sized FROM the
    state_dict, so both the HPSv2 ViT-H-14 checkpoint
    (reference: unidisc/tokenizers/hpsv2_img_score.py:14-47) and small
    random test checkpoints load.
  * AestheticPredictor — the LAION aesthetic v2 MLP head
    (`ava+logos-l14-linearMSE.pth`; reference:
    unidisc/tokenizers/laion_aesthetic_v2.py:12-29).

All modules are eval-only: no training paths, dropout layers exist only
where the checkpoints have keys.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# pytorch-fid InceptionV3 (torchvision inception_v3 key layout)
# ---------------------------------------------------------------------------

class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class InceptionA(nn.Module):
    """FID variant: avg pool uses count_include_pad=False."""

    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b5, b3, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionC(nn.Module):
    """FID variant: avg pool uses count_include_pad=False."""

    def __init__(self, cin, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1,
                                           count_include_pad=False))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class InceptionE(nn.Module):
    """pool_mode: 'avg' (Mixed_7b / FIDInceptionE_1, count_include_pad
    False) or 'max' (Mixed_7c / FIDInceptionE_2 — the TF FID model's
    quirk: a MAX pool where torchvision has avg)."""

    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3,
                                          padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            p = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            p = F.avg_pool2d(x, 3, stride=1, padding=1,
                             count_include_pad=False)
        return torch.cat([b1, b3, bd, self.branch_pool(p)], 1)


class FIDInceptionV3(nn.Module):
    """pytorch-fid's modified inception_v3 (num_classes=1008,
    aux_logits absent). state_dict keys match the published
    pt_inception-2015-12-05 file (torchvision layout)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, pool_features=32)
        self.Mixed_5c = InceptionA(256, pool_features=64)
        self.Mixed_5d = InceptionA(288, pool_features=64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, channels_7x7=128)
        self.Mixed_6c = InceptionC(768, channels_7x7=160)
        self.Mixed_6d = InceptionC(768, channels_7x7=160)
        self.Mixed_6e = InceptionC(768, channels_7x7=192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, pool_mode="avg")
        self.Mixed_7c = InceptionE(2048, pool_mode="max")
        self.fc = nn.Linear(2048, 1008)

    def features(self, x):
        """x: (B, 3, H, W) in [0, 1] -> (B, 2048) pool3 features,
        with pytorch-fid's 299-resize + [-1, 1] input scaling."""
        if x.shape[-2:] != (299, 299):
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
        x = 2 * x - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return torch.flatten(x, 1)

    def forward(self, x):
        return self.features(x)


# ---------------------------------------------------------------------------
# open_clip-compatible CLIP (HPSv2 checkpoint layout)
# ---------------------------------------------------------------------------

class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """open_clip resblock: pre-LN MHA + MLP; key layout
    resblocks.{i}.{ln_1,attn.in_proj_*,attn.out_proj,ln_2,
    mlp.c_fc,mlp.c_proj}."""

    def __init__(self, width, heads, quick_gelu=False):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads, batch_first=False)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
        self.mlp.add_module("gelu",
                            _QuickGELU() if quick_gelu else nn.GELU())
        self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

    def forward(self, x, attn_mask=None):
        a = self.ln_1(x)
        a = self.attn(a, a, a, need_weights=False, attn_mask=attn_mask)[0]
        x = x + a
        return x + self.mlp(self.ln_2(x))


class Transformer(nn.Module):
    def __init__(self, width, layers, heads, quick_gelu=False):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [ResidualAttentionBlock(width, heads, quick_gelu)
             for _ in range(layers)])

    def forward(self, x, attn_mask=None):
        for blk in self.resblocks:
            x = blk(x, attn_mask=attn_mask)
        return x


class VisionTower(nn.Module):
    def __init__(self, image_size, patch, width, layers, heads, embed_dim,
                 quick_gelu=False):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, kernel_size=patch, stride=patch,
                               bias=False)
        n = (image_size // patch) ** 2
        self.class_embedding = nn.Parameter(torch.zeros(width))
        self.positional_embedding = nn.Parameter(torch.zeros(n + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads, quick_gelu)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.zeros(width, embed_dim))

    def forward(self, x):
        x = self.conv1(x)                       # (B, W, g, g)
        x = x.flatten(2).transpose(1, 2)        # (B, g*g, W)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x).transpose(0, 1)      # (L, B, W)
        x = self.transformer(x).transpose(0, 1)
        return self.ln_post(x[:, 0]) @ self.proj


class OpenClipModel(nn.Module):
    """Inference CLIP with open_clip parameter names. Use
    ``from_state_dict`` to size the towers from a checkpoint — loads
    both the real ViT-H-14 HPSv2 weights and tiny random test ones."""

    def __init__(self, *, image_size, patch, v_width, v_layers, v_heads,
                 t_width, t_layers, t_heads, vocab, ctx, embed_dim,
                 quick_gelu=False):
        super().__init__()
        self.visual = VisionTower(image_size, patch, v_width, v_layers,
                                  v_heads, embed_dim, quick_gelu)
        self.token_embedding = nn.Embedding(vocab, t_width)
        self.positional_embedding = nn.Parameter(torch.zeros(ctx, t_width))
        self.transformer = Transformer(t_width, t_layers, t_heads,
                                       quick_gelu)
        self.ln_final = nn.LayerNorm(t_width)
        self.text_projection = nn.Parameter(torch.zeros(t_width, embed_dim))
        self.logit_scale = nn.Parameter(torch.zeros(()))
        mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        self.register_buffer("_causal_mask", mask, persistent=False)

    @staticmethod
    def infer_dims(sd: dict) -> dict:
        """Read tower sizes off an open_clip state_dict."""
        v_width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        n_tok = sd["visual.positional_embedding"].shape[0] - 1
        image_size = patch * int(round(n_tok ** 0.5))
        v_layers = 1 + max(int(k.split(".")[3]) for k in sd
                           if k.startswith("visual.transformer.resblocks."))
        t_width = sd["token_embedding.weight"].shape[1]
        t_layers = 1 + max(int(k.split(".")[2]) for k in sd
                           if k.startswith("transformer.resblocks."))
        return dict(
            image_size=image_size, patch=patch, v_width=v_width,
            v_layers=v_layers, v_heads=max(v_width // 80, 1),
            t_width=t_width, t_layers=t_layers,
            t_heads=max(t_width // 64, 1),
            vocab=sd["token_embedding.weight"].shape[0],
            ctx=sd["positional_embedding"].shape[0],
            embed_dim=sd["text_projection"].shape[1])

    @classmethod
    def from_state_dict(cls, sd: dict, **over) -> "OpenClipModel":
        dims = cls.infer_dims(sd)
        dims.update(over)
        model = cls(**dims)
        missing, unexpected = model.load_state_dict(sd, strict=False)
        missing = [k for k in missing if not k.endswith("_causal_mask")]
        assert not missing, f"missing keys: {missing[:8]}"
        # open_clip checkpoints may carry extras (e.g. the bundled
        # preprocess cfg or score heads) — surface genuinely unknown
        # model weights only
        bad = [k for k in unexpected
               if k.split(".")[0] in ("visual", "transformer",
                                      "token_embedding", "ln_final")]
        assert not bad, f"unmapped keys: {bad[:8]}"
        model.eval()
        return model

    def encode_image(self, images, normalize=True):
        f = self.visual(images)
        return F.normalize(f, dim=-1) if normalize else f

    def encode_text(self, tokens, normalize=True):
        x = self.token_embedding(tokens) + \
            self.positional_embedding[: tokens.shape[1]]
        x = x.transpose(0, 1)
        x = self.transformer(
            x, attn_mask=self._causal_mask[: x.shape[0], : x.shape[0]])
        x = self.ln_final(x.transpose(0, 1))
        # take features at the EOT token (highest id per row, as open_clip)
        f = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)] \
            @ self.text_projection
        return F.normalize(f, dim=-1) if normalize else f

    def forward(self, images, tokens):
        return {"image_features": self.encode_image(images),
                "text_features": self.encode_text(tokens),
                "logit_scale": self.logit_scale.exp()}


# ---------------------------------------------------------------------------
# LAION aesthetic v2 head
# ---------------------------------------------------------------------------

class AestheticPredictor(nn.Module):
    """MLP over 768-d CLIP ViT-L/14 image embeddings; state keys
    layers.{0,2,4,6,8}.* match the published
    ava+logos-l14-linearMSE.pth (reference:
    unidisc/tokenizers/laion_aesthetic_v2.py:12-29)."""

    def __init__(self, input_size=768):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Linear(input_size, 1024), nn.Dropout(0.2),
            nn.Linear(1024, 128), nn.Dropout(0.2),
            nn.Linear(128, 64), nn.Dropout(0.1),
            nn.Linear(64, 16), nn.Linear(16, 1))

    def forward(self, x):
        return self.layers(x)
