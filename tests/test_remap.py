"""Structural auto-remap (tokenizers/remap.py): foreign-named
checkpoints of the same architecture load through shape/order alignment.

VERDICT weak #9: the published showlab/magvitv2 / LlamaGen key layouts
are unreadable here (empty submodules, zero egress), so the remap is
validated structurally — take the trusted torch-mirror state_dict,
destroy its naming (foreign section names, renamed modules and leaves,
extra GAN-discriminator/EMA keys as real releases carry), and assert the
auto-remapped load is IDENTICAL to the direct mirror load."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.tokenizers.remap import (RemapReport, auto_remap,
                                          conv_mirror_template,
                                          load_magvit_foreign)


# ---------------------------------------------------------------------------
# unit: LCS alignment and section pairing


def test_auto_remap_exact_shapes():
    foreign = {
        "enc.c1.w": np.zeros((8, 3, 3, 3)),
        "enc.c1.b": np.zeros((8,)),
        "enc.c2.w": np.zeros((16, 8, 3, 3)),
        "dec.d1.w": np.zeros((3, 16, 3, 3)),
    }
    template = {
        "encoder.conv_in.weight": (8, 3, 3, 3),
        "encoder.conv_in.bias": (8,),
        "encoder.conv_out.weight": (16, 8, 3, 3),
        "decoder.conv_out.weight": (3, 16, 3, 3),
    }
    renamed, report = auto_remap(foreign, template)
    assert report.complete
    assert set(renamed) == set(template)
    assert report.mapping["enc.c1.w"] == "encoder.conv_in.weight"
    assert report.mapping["dec.d1.w"] == "decoder.conv_out.weight"


def test_auto_remap_skips_extras_and_reports_missing():
    foreign = {
        "encoder.a.weight": np.zeros((4, 4)),
        "loss.disc.weight": np.zeros((7, 7)),   # GAN head: no counterpart
    }
    template = {
        "encoder.a.weight": (4, 4),
        "encoder.b.weight": (5, 5),             # missing from the file
    }
    _, report = auto_remap(foreign, template)
    assert "loss.disc.weight" in report.skipped_foreign
    assert report.unmatched_mirror == ["encoder.b.weight"]
    assert not report.complete


def test_equal_shape_run_matches_in_order():
    # norm weight/bias + conv bias all share shape (C,): order decides
    foreign = {
        "m.n1.gamma": np.full((4,), 1.0),
        "m.n1.beta": np.full((4,), 2.0),
        "m.c1.bias": np.full((4,), 3.0),
    }
    template = {
        "mod.norm.weight": (4,),
        "mod.norm.bias": (4,),
        "mod.conv.bias": (4,),
    }
    renamed, report = auto_remap(foreign, template)
    assert report.complete
    assert renamed["mod.norm.weight"][0] == 1.0
    assert renamed["mod.norm.bias"][0] == 2.0
    assert renamed["mod.conv.bias"][0] == 3.0


# ---------------------------------------------------------------------------
# end-to-end: MAGVITv2 mirror -> foreign naming -> auto-remap load


def _foreignize(key: str) -> str:
    """Rewrite a mirror key into a taming/open-magvit2-flavoured foreign
    convention: different section names, dotted block paths, renamed
    norm leaves — order untouched (state_dict order is registration
    order in any torch implementation of the same forward)."""
    k = key
    k = k.replace("encoder.", "enc_net.").replace("decoder.", "dec_net.")
    k = k.replace("down_", "down.").replace("up_", "up.")
    k = k.replace("_block_", ".blk.").replace("_downsample", ".pool")
    k = k.replace("_upsample", ".unpool")
    k = k.replace("mid_block_1", "middle.one").replace(
        "mid_block_2", "middle.two")
    k = k.replace("norm1.weight", "norm1.gamma").replace(
        "norm1.bias", "norm1.beta")
    return k


def test_magvit_foreign_roundtrip():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.magvit import (MagvitConfig, MagvitLFQ,
                                               load_torch_state_dict)
    from tests.test_magvit import TMirror

    cfg = MagvitConfig(bits=6, ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = MagvitLFQ(cfg)
    imgs = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]

    torch.manual_seed(0)
    mirror = TMirror(cfg).eval()
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}

    direct = load_torch_state_dict(dict(params), dict(sd))

    foreign = {_foreignize(k): v for k, v in sd.items()}
    assert set(foreign) != set(sd)  # the renaming actually renames
    # real checkpoints carry trainer baggage: discriminator + EMA keys
    foreign["loss.discriminator.main.0.weight"] = \
        np.zeros((64, 3, 4, 4), np.float32)
    foreign["loss.discriminator.main.0.bias"] = np.zeros((64,), np.float32)

    ported, report = load_magvit_foreign(dict(params), foreign)
    assert report.complete
    assert len(report.skipped_foreign) == 2  # just the discriminator

    flat_d = jax.tree_util.tree_leaves(direct)
    flat_p = jax.tree_util.tree_leaves(ported)
    for a, b in zip(flat_d, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_magvit_foreign_detects_architecture_drift():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.magvit import MagvitConfig, MagvitLFQ
    from tests.test_magvit import TMirror

    cfg = MagvitConfig(bits=6, ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = MagvitLFQ(cfg)
    imgs = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]

    torch.manual_seed(0)
    # checkpoint of a DIFFERENT architecture (wider): must refuse loudly
    wrong = TMirror(MagvitConfig(bits=6, ch=64, ch_mult=(1, 2),
                                 num_res_blocks=1)).eval()
    sd = {_foreignize(k): v.detach().numpy()
          for k, v in wrong.state_dict().items()}
    with pytest.raises(ValueError, match="does not cover"):
        load_magvit_foreign(dict(params), sd)


def test_conv_mirror_template_matches_mirror_keys():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.magvit import MagvitConfig, MagvitLFQ
    from tests.test_magvit import TMirror

    cfg = MagvitConfig(bits=6, ch=32, ch_mult=(1, 2), num_res_blocks=1)
    model = MagvitLFQ(cfg)
    imgs = np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]

    torch.manual_seed(0)
    mirror = TMirror(cfg).eval()
    sd = {k: tuple(v.shape) for k, v in mirror.state_dict().items()}
    template = conv_mirror_template(params)
    assert template == {k: sd[k] for k in template}
    assert set(template) == set(sd)


# ---------------------------------------------------------------------------
# VQGAN (LlamaGen layout): template + foreign roundtrip


def test_vqgan_template_matches_mirror():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.remap import vqgan_mirror_template
    from unidisc_tpu.tokenizers.vqgan import VQConfig
    from tests.test_vqgan import TINY, build_torch_vqmodel

    cfg = VQConfig(**TINY)
    torch.manual_seed(0)
    mirror = build_torch_vqmodel(cfg)
    sd = {k: tuple(v.shape) for k, v in mirror.state_dict().items()}
    template = vqgan_mirror_template(cfg)
    assert template == sd
    assert list(template) == list(sd)  # registration ORDER too


def test_vqgan_foreign_roundtrip():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.remap import load_vqgan_foreign
    from unidisc_tpu.tokenizers.vqgan import (VQGAN, VQConfig,
                                              load_torch_state_dict)
    from tests.test_vqgan import TINY, build_torch_vqmodel

    cfg = VQConfig(**TINY)
    torch.manual_seed(0)
    mirror = build_torch_vqmodel(cfg)
    model = VQGAN(cfg)
    imgs = np.random.RandomState(0).uniform(
        -1, 1, (1, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    sd = {k: v.detach().numpy() for k, v in mirror.state_dict().items()}
    direct = load_torch_state_dict(dict(params), dict(sd))

    # taming-flavoured renaming: sections, list nesting, leaf names
    def fz(k):
        k = k.replace("encoder.", "enc.").replace("decoder.", "dec.")
        k = k.replace("conv_blocks.", "down.") if k.startswith("enc") \
            else k.replace("conv_blocks.", "up.")
        k = k.replace(".res.", ".block.").replace("quantize.embedding",
                                                  "vq.codes")
        k = k.replace("norm1.weight", "norm1.g").replace(
            "norm1.bias", "norm1.b")
        return k

    foreign = {fz(k): v for k, v in sd.items()}
    assert set(foreign) != set(sd)
    foreign["loss.disc.0.weight"] = np.zeros((8, 3, 4, 4), np.float32)

    ported, report = load_vqgan_foreign(dict(params), foreign, cfg)
    assert report.complete
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(ported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# TiTok (ViT layout): template + foreign roundtrip


def test_titok_template_matches_mirror():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.remap import titok_mirror_template
    from tests.test_titok import CFG, TTiTok

    torch.manual_seed(0)
    mirror = TTiTok(CFG).eval()
    sd = {k: tuple(v.shape) for k, v in mirror.state_dict().items()}
    template = titok_mirror_template(CFG)
    assert template == sd
    assert list(template) == list(sd)


def test_titok_foreign_roundtrip():
    torch = pytest.importorskip("torch")
    from unidisc_tpu.tokenizers.remap import load_titok_foreign
    from unidisc_tpu.tokenizers.titok import TiTok, load_torch_state_dict
    from tests.test_titok import CFG, TTiTok, _torch_sd

    torch.manual_seed(0)
    mirror = TTiTok(CFG).eval()
    model = TiTok(CFG)
    imgs = np.random.RandomState(3).rand(1, 16, 16, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs))["params"]
    sd = _torch_sd(mirror)
    direct = load_torch_state_dict(dict(params), dict(sd), CFG.n_layers)

    # 1d-tokenizer-flavoured renaming (keeps registration order)
    def fz(k):
        k = k.replace("encoder.", "enc.transformer.")
        k = k.replace("decoder.", "dec.transformer.")
        k = k.replace("mlp_0", "mlp.fc1").replace("mlp_2", "mlp.fc2")
        k = k.replace("to_pixels", "ffn_out")
        return k

    foreign = {fz(k): v for k, v in sd.items()}
    assert set(foreign) != set(sd)
    ported, report = load_titok_foreign(dict(params), foreign, CFG)
    assert report.complete
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(ported)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
