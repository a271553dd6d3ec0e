"""Text tokenizer tests (reference: dataloader.py:34-88;
model_utils.py:99-104)."""

import numpy as np

from unidisc_tpu.tokenizers.text import (ByteTokenizer, get_tokenizer,
                                         mask_after_eos,
                                         wrapped_batch_decode)


def test_byte_roundtrip():
    tok = get_tokenizer("byte")
    assert isinstance(tok, ByteTokenizer)
    text = "hello world! ünïcødé"
    ids = tok.encode(text)
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == text


def test_image_token_surgery():
    tok = ByteTokenizer()
    ids = tok.encode("a<image>b")
    assert tok.image_token_id in ids
    assert tok.decode(ids) == "a<image>b"


def test_batch_call_padding_truncation():
    tok = ByteTokenizer()
    out = tok(["hi", "a much longer string that will be truncated"],
              max_length=16)
    assert out["input_ids"].shape == (2, 16)
    assert out["attention_mask"].shape == (2, 16)
    # truncated row ends with EOS
    assert out["input_ids"][1][-1] == tok.eos_token_id
    # short row padded, mask marks real tokens
    assert out["attention_mask"][0].sum() == len(tok.encode("hi"))
    assert (out["input_ids"][0][out["attention_mask"][0] == 0]
            == tok.pad_token_id).all()


def test_mask_after_eos():
    ids = np.asarray([[5, 6, 2, 7, 8], [5, 6, 7, 8, 9]])
    out = mask_after_eos(ids, eos_id=2, pad_id=0)
    np.testing.assert_array_equal(out[0], [5, 6, 2, 0, 0])
    np.testing.assert_array_equal(out[1], [5, 6, 7, 8, 9])


def test_wrapped_batch_decode():
    tok = ByteTokenizer()
    ids = np.asarray(tok(["abc", "de"], max_length=8)["input_ids"])
    # inject garbage after eos; decode must ignore it
    ids[0, -1] = tok.encode("x", add_bos=False, add_eos=False)[0]
    texts = wrapped_batch_decode(tok, ids)
    assert texts == ["abc", "de"]
