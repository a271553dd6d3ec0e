"""Chameleon-style interleaved stream tokenizer tests.

Covers the surface of reference unidisc/tokenizers/chameleon_tokenizers.py:
crop-size lists + var-aspect cropping (:87-113), the grid/newline stream
layout (:115-180), and stream decode (:643-706)."""

import numpy as np
import pytest

from unidisc_tpu.tokenizers.chameleon import (
    ChameleonSpec, batch_encode, build_crop_size_list, center_crop_to,
    decode_stream, encode_document, var_center_crop)

SPEC = ChameleonSpec(text_vocab=1000, img_vocab=4096, patch_size=16,
                     max_grids=64)


def test_crop_size_list_budget_and_aspect():
    sizes = build_crop_size_list(patch_size=16, max_grids=64, max_aspect=4.0)
    assert sizes
    for h, w in sizes:
        assert h % 16 == 0 and w % 16 == 0
        assert (h // 16) * (w // 16) <= 64
        assert max(h / w, w / h) <= 4.0
    assert (128, 128) in sizes  # the square 8x8-grid member


def test_var_center_crop_picks_matching_aspect():
    sizes = build_crop_size_list(patch_size=16, max_grids=64)
    img = np.random.default_rng(0).random((300, 150, 3)).astype(np.float32)
    out = var_center_crop(img, sizes)
    assert (out.shape[0], out.shape[1]) in sizes
    # A 2:1-tall image should land on a tall crop.
    assert out.shape[0] > out.shape[1]


def test_center_crop_halving_path():
    # 4x the target area exercises the area-downscale loop.
    img = np.ones((512, 512, 3), np.float32) * 0.5
    out = center_crop_to(img, (128, 128))
    assert out.shape == (128, 128, 3)
    np.testing.assert_allclose(out, 0.5, atol=1e-5)


def test_image_grid_roundtrip():
    rng = np.random.default_rng(1)
    grid = rng.integers(0, SPEC.img_vocab, size=(8, 12))
    stream = SPEC.encode_image_grid(grid)
    assert stream[0] == SPEC.image_start
    assert stream[-1] == SPEC.image_end
    assert SPEC.grid_from_token(int(stream[1])) == 8
    assert SPEC.grid_from_token(int(stream[2])) == 12
    assert len(stream) == SPEC.image_span_length(8, 12)
    # Newline closes each row.
    body = stream[3:-1].reshape(8, 13)
    assert (body[:, -1] == SPEC.new_line).all()
    back = SPEC.decode_image_span(stream[1:-1])
    np.testing.assert_array_equal(back, grid)


def test_document_roundtrip_multi_image():
    rng = np.random.default_rng(2)
    t1 = rng.integers(0, SPEC.text_vocab, size=7)
    g1 = rng.integers(0, SPEC.img_vocab, size=(4, 4))
    t2 = rng.integers(0, SPEC.text_vocab, size=5)
    g2 = rng.integers(0, SPEC.img_vocab, size=(2, 6))
    stream = encode_document(SPEC, [t1, g1, t2, g2])
    text, grids = decode_stream(SPEC, stream)
    ph = SPEC.image_placeholder
    np.testing.assert_array_equal(
        text, np.concatenate([t1, [ph], t2, [ph]]))
    assert len(grids) == 2
    np.testing.assert_array_equal(grids[0], g1)
    np.testing.assert_array_equal(grids[1], g2)


def test_decode_drops_unterminated_span():
    t = np.arange(3)
    g = np.zeros((2, 2), np.int64)
    stream = encode_document(SPEC, [t, g])[:-2]  # cut inside the image
    text, grids = decode_stream(SPEC, stream)
    np.testing.assert_array_equal(text, t)
    assert grids == []


def test_batch_encode_pads_and_truncates():
    t = np.arange(4)
    g = np.ones((2, 2), np.int64)
    full_len = 4 + SPEC.image_span_length(2, 2)
    ids, mask = batch_encode(SPEC, [[t, g], [t]], length=full_len + 3)
    assert ids.shape == mask.shape == (2, full_len + 3)
    assert mask[0].sum() == full_len and mask[1].sum() == 4
    assert (ids[1, 4:] == 0).all()
    # Truncation clips at length.
    ids2, mask2 = batch_encode(SPEC, [[t, g]], length=5)
    assert mask2.sum() == 5 and ids2.shape[1] == 5


def test_grid_token_bounds():
    with pytest.raises(ValueError):
        SPEC.grid_token(0)
    with pytest.raises(ValueError):
        SPEC.grid_token(SPEC.max_grids + 1)


def test_tokenize_t2i_batch_with_codec():
    from unidisc_tpu.tokenizers.chameleon import tokenize_t2i_batch
    from unidisc_tpu.tokenizers.image_codecs import get_codec
    from unidisc_tpu.tokenizers.text import get_tokenizer

    codec = get_codec("dummy", image_size=64)
    spec = ChameleonSpec(text_vocab=512, img_vocab=codec.vocab_size,
                         patch_size=codec.downsample)
    tok = get_tokenizer("byte")
    imgs = np.random.default_rng(3).random((2, 64, 64, 3)).astype(np.float32)
    ids, mask = tokenize_t2i_batch(
        spec, tok, codec, imgs, ["a cat", "a dog"], length=128)
    assert ids.shape == (2, 128)
    # Each row contains exactly one image span.
    assert (ids == spec.image_start).sum(axis=1).tolist() == [1, 1]
    text, grids = decode_stream(spec, ids[0][mask[0]])
    g = 64 // codec.downsample
    assert grids[0].shape == (g, g)
    # Image ids round-trip through the codec vocabulary.
    assert (grids[0] >= 0).all() and (grids[0] < codec.vocab_size).all()


def test_var_crop_selection_parity_vs_reference_code():
    """The aspect-ranking crop selection must match the REAL reference
    functions (unidisc/tokenizers/chameleon_tokenizers.py:87-113
    tensor_center_crop / var_center_crop) executed via torch on identical
    inputs. random_top_k=1 makes the reference's choice deterministic; the
    center-crop comparison uses constant images so torch-vs-jax resize
    differences cancel."""
    import torch

    from tests.reference_compat import extract_functions

    ns = extract_functions(
        "/root/reference/unidisc/tokenizers/chameleon_tokenizers.py",
        ["tensor_center_crop", "var_center_crop"],
        extra_globals={"torch": torch, "F": torch.nn.functional,
                       "random": __import__("random")})

    from unidisc_tpu.tokenizers.chameleon import (build_crop_size_list,
                                                  var_center_crop)

    # NOTE: the reference unpacks list entries as (cw, ch) when RANKING
    # (var_center_crop:106) but tensor_center_crop treats the same entry
    # as (crop_h, crop_w) when CROPPING (:87-102) — internally transposed
    # for non-square crops. The transposition-invariant quantity both
    # implementations must agree on is the retained-aspect score of the
    # chosen crop; with our symmetric size list the winning score is
    # well-defined either way.
    # symmetrize (every transposed twin present) so the aspect choice is
    # orientation-invariant and the two conventions comparable
    base = build_crop_size_list(patch_size=16, max_grids=64)
    sizes = sorted(set(base) | {(w, h) for (h, w) in base})

    def rem(crop_hw, H, W):
        ch, cw = crop_hw
        return min(cw / W, ch / H) / max(cw / W, ch / H)

    for (H, W) in [(300, 150), (150, 300), (224, 224), (640, 100)]:
        img = np.full((H, W, 3), 0.25, np.float32)
        ours = var_center_crop(img, sizes)  # top_k=1, deterministic

        t_img = torch.full((1, 3, H, W), 0.25)
        __import__("random").seed(0)
        ref = ns["var_center_crop"](t_img, [tuple(s) for s in sizes],
                                    random_top_k=1)
        ref_hw = tuple(ref.shape[-2:])
        # both pick a crop with the maximal retained-aspect score (the
        # dims-set is orientation-invariant on a symmetric list)
        assert abs(max(rem(ours.shape[:2], H, W),
                       rem(ours.shape[:2][::-1], H, W)) -
                   max(rem(ref_hw, H, W),
                       rem(ref_hw[::-1], H, W))) < 1e-9, \
            (ours.shape, ref.shape)
        # constant image -> identical content regardless of resize impl
        np.testing.assert_allclose(ours, 0.25, atol=1e-5)
        np.testing.assert_allclose(ref.numpy(), 0.25, atol=1e-5)
