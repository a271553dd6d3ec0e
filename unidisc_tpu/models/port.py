"""Port reference UniDisc torch checkpoints into the Flax DIT.

Maps the published HF checkpoints (`aswerdlow/unidisc_interleaved` /
`unidisc_non_interleaved`, saved via PyTorchModelHubMixin on the reference
DIT — reference: models/dit.py:1095) onto our scan-stacked parameter tree.

Key correspondences (torch name -> flax path):
  vocab_embed.embedding              -> vocab_embed
  modality_embed.embedding           -> modality_embed
  sigma_map.mlp.{0,2}.{weight,bias}  -> sigma_map/mlp_{0,2}/{kernel,bias}
  blocks.{i}.attn_qkv.weight         -> blocks/attention/attn_qkv/kernel[i]
  blocks.{i}.attn_out.weight         -> blocks/attention/attn_out/kernel[i]
  blocks.{i}.{q,k}_norm.{weight,bias}-> blocks/attention/{q,k}_norm/...
  blocks.{i}.norm{1,2}.weight        -> blocks/norm{1,2}/weight[i]
  blocks.{i}.adaLN_modulation.*      -> blocks/adaLN_modulation/*[i]
  blocks.{i}.mlp.{0,2}.*             -> blocks/mlp_{0,2}/*[i]
  blocks.{i}.pre_residual_norm.weight-> blocks/pre_residual_norm/weight[i]
  blocks.{i}.post_ff_norm.weight     -> blocks/post_ff_norm/weight[i]
  output_layer.norm_final.weight     -> output_layer/norm_final/weight
  output_layer.adaLN_modulation.*    -> output_layer/adaLN_modulation/*
  output_layer.linear.*              -> output_layer/linear/*
  y_embedder.embedding_table.weight  -> y_embedder/embedding_table

Per-block tensors are stacked along a leading axis (our blocks are
nn.scan-stacked: one compiled block, n_blocks-stacked params). Torch linear
weights (out, in) are transposed to Flax (in, out).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def port_dit_state_dict(params: Dict, state_dict: Dict,
                        *, strict: bool = True) -> Dict:
    """Return a params tree with values from a reference torch state_dict."""
    import flax

    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    out = dict(flat)
    # the PRODUCTION DIT nests attention params as a submodule
    # (blocks.{i}.attention.attn_qkv.weight, models/dit.py:890+ — the
    # naming the published PyTorchModelHubMixin checkpoints carry), while
    # the frozen dit_orig keeps them flat (blocks.{i}.attn_qkv.weight).
    # Normalize to the flat form.
    sd = {k.replace(".attention.", "."): np.asarray(v)
          for k, v in state_dict.items()}
    used = set()

    def put(fkey: str, arr: np.ndarray, transpose: bool = False):
        assert fkey in flat, f"flax tree has no {fkey}"
        if transpose:
            arr = arr.T if arr.ndim == 2 else arr
        assert arr.shape == flat[fkey].shape, \
            f"{fkey}: ckpt {arr.shape} vs model {flat[fkey].shape}"
        out[fkey] = jnp.asarray(arr)

    def take(tkey: str) -> np.ndarray:
        used.add(tkey)
        return sd[tkey]

    def maybe(tkey: str):
        if tkey in sd:
            used.add(tkey)
            return sd[tkey]
        return None

    # globals
    put("vocab_embed", take("vocab_embed.embedding"))
    if "img_vocab_embed.weight" in sd:
        # split-embed checkpoints (use_pretrained_img_emb,
        # reference models/dit.py:1343-1359): frozen VQ codebook + proj
        put("img_vocab_embed", take("img_vocab_embed.weight"))
        put("img_vocab_proj/kernel", take("img_vocab_proj.weight"),
            transpose=True)
        put("img_vocab_proj/bias", take("img_vocab_proj.bias"))
    if "img_count_embedding" in sd:
        put("img_count_embedding", take("img_count_embedding"))
    if "modality_embed.embedding" in sd:
        put("modality_embed", take("modality_embed.embedding"))
    for i in (0, 2):
        w = maybe(f"sigma_map.mlp.{i}.weight")
        if w is not None:
            put(f"sigma_map/mlp_{i}/kernel", w, transpose=True)
            put(f"sigma_map/mlp_{i}/bias", take(f"sigma_map.mlp.{i}.bias"))
    if "y_embedder.embedding_table.weight" in sd:
        put("y_embedder/embedding_table",
            take("y_embedder.embedding_table.weight"))

    # blocks (stack along leading scan axis)
    n_blocks = 0
    while f"blocks.{n_blocks}.attn_qkv.weight" in sd:
        n_blocks += 1
    assert n_blocks > 0, "no blocks.* keys found"

    def stack(tname: str, transpose: bool = False, *,
              prefix: str = "blocks", count: int = 0) -> np.ndarray:
        arrs = []
        for i in range(count or n_blocks):
            a = take(f"{prefix}.{i}.{tname}")
            arrs.append(a.T if (transpose and a.ndim == 2) else a)
        return np.stack(arrs, 0)

    put("blocks/attention/attn_qkv/kernel", stack("attn_qkv.weight", True))
    put("blocks/attention/attn_out/kernel", stack("attn_out.weight", True))
    for norm in ("q_norm", "k_norm"):
        if f"blocks.0.{norm}.weight" in sd:
            put(f"blocks/attention/{norm}/scale", stack(f"{norm}.weight"))
            put(f"blocks/attention/{norm}/bias", stack(f"{norm}.bias"))
    put("blocks/norm1/weight", stack("norm1.weight"))
    put("blocks/norm2/weight", stack("norm2.weight"))
    if "blocks.0.adaLN_modulation.weight" in sd:
        put("blocks/adaLN_modulation/kernel",
            stack("adaLN_modulation.weight", True))
        put("blocks/adaLN_modulation/bias", stack("adaLN_modulation.bias"))
    for i in (0, 2):
        put(f"blocks/mlp_{i}/kernel", stack(f"mlp.{i}.weight", True))
        put(f"blocks/mlp_{i}/bias", stack(f"mlp.{i}.bias"))
    if "blocks.0.pre_residual_norm.weight" in sd:
        put("blocks/pre_residual_norm/weight",
            stack("pre_residual_norm.weight"))
        put("blocks/post_ff_norm/weight", stack("post_ff_norm.weight"))

    # img_cond cross-attention conditioning (reference models/dit.py:
    # 1147-1183 cond trunk + 910-911 per-block cross_attention modules)
    if "blocks.0.cross_attention.attn_qkv.weight" in sd:
        for nm in ("attn_qkv", "attn_qkv_cond", "attn_out"):
            put(f"blocks/cross_attention/{nm}/kernel",
                stack(f"cross_attention.{nm}.weight", True))
        if "cond_img_vocab_embed.embedding" in sd:
            put("cond_img_vocab_embed",
                take("cond_img_vocab_embed.embedding"))
        else:
            # pretrained cond VQ codebook + projection
            # (models/dit.py:1148-1151; nn.Embedding saves .weight)
            put("cond_img_vocab_embed", take("cond_img_vocab_embed.weight"))
            put("cond_img_vocab_proj/kernel",
                take("cond_img_vocab_proj.weight"), transpose=True)
            put("cond_img_vocab_proj/bias", take("cond_img_vocab_proj.bias"))
        n_cond = 0
        while f"img_cond_blocks.{n_cond}.attn_qkv.weight" in sd:
            n_cond += 1
        assert n_cond > 0, "img_cond ckpt without img_cond_blocks.*"
        cb = dict(prefix="img_cond_blocks", count=n_cond)
        put("img_cond_blocks/attention/attn_qkv/kernel",
            stack("attn_qkv.weight", True, **cb))
        put("img_cond_blocks/attention/attn_out/kernel",
            stack("attn_out.weight", True, **cb))
        put("img_cond_blocks/norm1/weight", stack("norm1.weight", **cb))
        put("img_cond_blocks/norm2/weight", stack("norm2.weight", **cb))
        for i in (0, 2):
            put(f"img_cond_blocks/mlp_{i}/kernel",
                stack(f"mlp.{i}.weight", True, **cb))
            put(f"img_cond_blocks/mlp_{i}/bias",
                stack(f"mlp.{i}.bias", **cb))
        # the reference builds the cond blocks with the model's
        # time_conditioning flag, so adaLN tables exist in such
        # checkpoints even though the runtime passes c=None
        # (models/dit.py:1393) — drop them (our cond blocks are
        # unconditioned, the only runnable reading)
        for i in range(n_cond):
            for nm in ("adaLN_modulation.weight", "adaLN_modulation.bias"):
                if f"img_cond_blocks.{i}.{nm}" in sd:
                    used.add(f"img_cond_blocks.{i}.{nm}")

    # output layer
    put("output_layer/norm_final/weight",
        take("output_layer.norm_final.weight"))
    put("output_layer/linear/kernel", take("output_layer.linear.weight"),
        transpose=True)
    put("output_layer/linear/bias", take("output_layer.linear.bias"))
    if "output_layer.adaLN_modulation.weight" in sd:
        put("output_layer/adaLN_modulation/kernel",
            take("output_layer.adaLN_modulation.weight"), transpose=True)
        put("output_layer/adaLN_modulation/bias",
            take("output_layer.adaLN_modulation.bias"))

    if strict:
        ignorable = {k for k in sd
                     if "rotary" in k or "attn_qkv_cond" in k
                     or k.endswith("num_batches_tracked")}
        missed = set(sd) - used - ignorable
        assert not missed, f"unmapped torch keys: {sorted(missed)[:10]}"

    return flax.traverse_util.unflatten_dict(out, sep="/")


def read_reference_state_dict(path: str) -> Dict:
    """Read a published-checkpoint file (.safetensors as saved by
    PyTorchModelHubMixin, or a torch .pt/.bin) into a numpy state_dict
    with wrapper prefixes stripped."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        sd = dict(load_file(path))
    else:
        import torch
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
    return {k.removeprefix("module.").removeprefix("backbone."): v
            for k, v in sd.items()}


def infer_dit_overrides(state_dict: Dict) -> Dict:
    """Infer `model.*` config overrides from a reference DIT
    state_dict's SHAPES — the checkpoint-drop protocol: a dropped
    `model.safetensors` determines the architecture, so serving it must
    not require hand-matching flags to the training recipe.

    Inferable: hidden/cond dims, block count, vocab split (exact for
    split-embed checkpoints; via the known VQ-16 codebook size
    otherwise), norm type, sandwich/modality/qk-norm/time-conditioning
    flags, split embed + frozen-codebook width, img-count embedding,
    class-label conditioning. Head count is NOT weight-inferable (qkv
    is (3H, H), the reference's q_norm is over full hidden, and the 1D
    rotary saves no buffer) — resolved via the reference model-zoo
    table with a head_dim-64 fallback; a non-zoo, non-64-divisible
    width keeps the serving preset's n_heads. Also not inferable
    (rotary tables are position-free): sequence layout
    (length/txt_length/img_length) and rope_2d — those stay with the
    preset/CLI.
    """
    sd = {k.replace(".attention.", "."): v for k, v in state_dict.items()}
    shp = {k: tuple(v.shape) for k, v in sd.items()}
    over: Dict = {}

    hidden = shp["vocab_embed.embedding"][1]
    over["model.hidden_size"] = hidden
    n_blocks = 0
    while f"blocks.{n_blocks}.attn_qkv.weight" in shp:
        n_blocks += 1
    assert n_blocks, "no blocks.* keys — not a DIT state_dict"
    over["model.n_blocks"] = n_blocks
    over["model.mlp_ratio"] = shp["blocks.0.mlp.0.weight"][0] // hidden

    over["model.qk_norm"] = "blocks.0.q_norm.weight" in shp
    # head count is NOT weight-inferable (qkv is (3H, H); the reference's
    # q_norm is over full hidden, dit.py:570; the 1D rotary is built
    # inline so no inv_freq buffer is saved, dit.py:1235) — use the
    # reference model zoo (configs/model/*.yaml), falling back to the
    # head_dim-64 convention; otherwise the serving preset decides
    _ZOO_HEADS = {256: 8, 512: 8, 768: 12, 1024: 16, 1280: 20,
                  2048: 16, 4096: 16}
    if hidden in _ZOO_HEADS:
        over["model.n_heads"] = _ZOO_HEADS[hidden]
    elif hidden % 64 == 0:
        over["model.n_heads"] = hidden // 64

    over["model.time_conditioning"] = "sigma_map.mlp.0.weight" in shp
    if over["model.time_conditioning"]:
        over["model.cond_dim"] = shp["sigma_map.mlp.0.weight"][0]
    # rms vs bias-less layernorm is not distinguishable from shapes;
    # in the reference zoo rms ships ONLY with the large_scale_train
    # production markers (qk_norm/sandwich, large_scale_train.yaml:88-90)
    # while the default config is layernorm (config.yaml:121)
    production = (over["model.qk_norm"]
                  or "blocks.0.pre_residual_norm.weight" in shp
                  or "modality_embed.embedding" in shp)
    over["model.norm_type"] = (
        "layernorm" if "blocks.0.norm1.bias" in shp
        else ("rms" if production else "layernorm"))
    over["model.sandwich_normalization"] = \
        "blocks.0.pre_residual_norm.weight" in shp
    over["model.modality_embed"] = "modality_embed.embedding" in shp
    over["model.img_count_embed"] = "img_count_embedding" in shp
    if over["model.img_count_embed"]:
        over["model.max_images_per_sample"] = shp["img_count_embedding"][0]
    over["model.cond_label"] = "y_embedder.embedding_table.weight" in shp
    if over["model.cond_label"] and not over["model.time_conditioning"]:
        # class-conditional checkpoints have no sigma_map (reference
        # dit.py creates it only without cond_label) — cond_dim is the
        # label table's width
        over["model.cond_dim"] = shp["y_embedder.embedding_table.weight"][1]

    over["model.img_cond"] = \
        "blocks.0.cross_attention.attn_qkv.weight" in shp
    if over["model.img_cond"]:
        key = ("cond_img_vocab_embed.embedding"
               if "cond_img_vocab_embed.embedding" in shp
               else "cond_img_vocab_embed.weight")
        over["model.cond_image_vocab_size"] = shp[key][0]
        if "cond_img_vocab_proj.weight" in shp:
            over["model.cond_img_embed_dim"] = shp[key][1]
        n_cond = 0
        while f"img_cond_blocks.{n_cond}.attn_qkv.weight" in shp:
            n_cond += 1
        over["model.n_cond_blocks"] = n_cond
        # cond_length is positional (rotary tables are position-free) —
        # stays with the preset/CLI

    if "img_vocab_embed.weight" in shp:
        # split-embed (use_pretrained_img_emb): the vocab split is exact
        # — text table has text_vocab+1 rows (mask), image table is the
        # frozen VQ codebook
        over["model.split_embed"] = True
        over["model.text_vocab_size"] = shp["vocab_embed.embedding"][0] - 1
        over["model.image_vocab_size"] = shp["img_vocab_embed.weight"][0]
        over["model.img_embed_dim"] = shp["img_vocab_embed.weight"][1]
    else:
        over["model.split_embed"] = False
        vocab = shp["vocab_embed.embedding"][0]
        # joint table: the split is a recipe choice, but every published
        # config pairs the LLaMA-2 text vocab (+mask) with a 16384-way
        # VQ codebook — recover it from the total
        if vocab > 16384:
            over["model.text_vocab_size"] = vocab - 16384
            over["model.image_vocab_size"] = 16384
    return over


def load_reference_checkpoint(params: Dict, path: str, **kw) -> Dict:
    """Load a .safetensors / .pt reference checkpoint file."""
    return port_dit_state_dict(params, read_reference_state_dict(path),
                               **kw)
