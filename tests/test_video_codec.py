"""Video VQVAE codec tests (tokenizers/video.py — the reference's
video-token backend, image_tokenizers.py video branch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.tokenizers.image_codecs import get_codec, get_video_codec
from unidisc_tpu.tokenizers.video import VideoVQConfig, VideoVQVAE

TINY = dict(codebook_size=64, codebook_dim=16, ch=8, ch_mult=(1, 2),
            num_res_blocks=1)


def test_video_vqvae_roundtrip_shapes():
    cfg = VideoVQConfig(**TINY)
    assert cfg.downsample == 4
    model = VideoVQVAE(cfg)
    clips = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 16, 16, 3),
                               minval=-1, maxval=1)
    params = model.init(jax.random.PRNGKey(0), clips)["params"]

    ids = model.apply({"params": params}, clips, method=VideoVQVAE.encode)
    assert ids.shape == (2, 2 * 4 * 4)  # (8/4) * (16/4)^2 time-major
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < 64).all()

    recon = model.apply({"params": params}, ids, 2, 4,
                        method=VideoVQVAE.decode)
    assert recon.shape == (2, 8, 16, 16, 3)

    recon2, ids2 = model.apply({"params": params}, clips)
    assert recon2.shape == (2, 8, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_video_quantizer_is_idempotent_on_code_vectors():
    """quantize(lookup(ids)) == ids: a codebook vector's nearest code is
    itself (the L2-normalized argmax-dot lookup is exact)."""
    cfg = VideoVQConfig(**TINY)
    model = VideoVQVAE(cfg)
    clips = jnp.zeros((1, 8, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), clips)["params"]
    ids = jnp.arange(32).reshape(1, 32) % cfg.codebook_size

    def requant(mdl, ids):
        z = mdl.lookup(ids).reshape(1, 2, 4, 4, cfg.codebook_dim)
        return mdl.quantize(z).reshape(1, -1)

    back = model.apply({"params": params}, ids, method=requant)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_video_codec_factory_and_jit():
    codec = get_video_codec("video-vqvae", frames=8, image_size=16, **TINY)
    assert codec.vocab_size == 64 and codec.downsample == 4
    clips = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 16, 16, 3),
                               minval=-1, maxval=1)
    ids = jax.jit(codec.encode)(codec.params, clips)
    assert ids.shape == (2, 32)
    recon = jax.jit(codec.decode)(codec.params, ids)
    assert recon.shape == (2, 8, 16, 16, 3)
    # the image factory points video users at this one
    with pytest.raises(ValueError, match="video"):
        get_codec("video-vqvae")
    with pytest.raises(ValueError):
        get_video_codec("nope")
