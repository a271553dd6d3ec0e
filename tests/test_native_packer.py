"""Native C++ packer vs the Python oracle (native/packer.cpp twin of
interleaved.pack_documents; reference semantics: PackingCollate,
dataloader.py:564-677)."""

import time

import numpy as np
import pytest

from unidisc_tpu.data.interleaved import make_document, pack_documents
from unidisc_tpu.data.native_packer import (native_available,
                                            pack_documents_native)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")

KEYS = ("input_ids", "modality", "sample_ids", "rope_index",
        "attention_mask")


def random_docs(rng, n, max_segs=4, grid=4):
    docs = []
    for _ in range(n):
        segs = []
        for _ in range(int(rng.integers(1, max_segs + 1))):
            if rng.random() < 0.5:
                ln = int(rng.integers(1, 20))
                segs.append(("text", rng.integers(0, 100, ln)))
            else:
                segs.append(("image", rng.integers(100, 200, grid * grid),
                             grid))
        docs.append(make_document(interleave=segs))
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("eos_id", [None, 99])
def test_native_matches_python_fuzz(seed, eos_id):
    rng = np.random.default_rng(seed)
    docs = random_docs(rng, 12)
    ref = pack_documents(docs, 64, pad_id=0, eos_id=eos_id, batch_size=8)
    nat = pack_documents_native(docs, 64, pad_id=0, eos_id=eos_id,
                                batch_size=8)
    for k in KEYS:
        np.testing.assert_array_equal(ref[k], nat[k], err_msg=k)


def test_native_matches_multires_rope_offsets():
    rng = np.random.default_rng(5)
    docs = random_docs(rng, 6, grid=2)
    offsets = {4: 1000}
    ref = pack_documents(docs, 48, pad_id=0, eos_id=7,
                         rope_offsets=offsets)
    nat = pack_documents_native(docs, 48, pad_id=0, eos_id=7,
                                rope_offsets=offsets)
    for k in KEYS:
        np.testing.assert_array_equal(ref[k], nat[k], err_msg=k)


def test_native_truncates_oversized_docs():
    docs = [make_document(interleave=[
        ("text", np.arange(30)), ("image", np.arange(16), 4),
        ("image", np.arange(16), 4)])]
    ref = pack_documents(docs, 40, pad_id=0, eos_id=9)
    nat = pack_documents_native(docs, 40, pad_id=0, eos_id=9)
    for k in KEYS:
        np.testing.assert_array_equal(ref[k], nat[k], err_msg=k)


def test_native_empty_and_padding():
    nat = pack_documents_native([], 16, pad_id=3, batch_size=2)
    assert nat["input_ids"].shape == (2, 16)
    assert (nat["input_ids"] == 3).all()
    assert (nat["sample_ids"] == -1).all()
    assert not nat["attention_mask"].any()


def test_native_is_faster_at_scale():
    rng = np.random.default_rng(7)
    docs = random_docs(rng, 512, max_segs=6, grid=8)
    t0 = time.perf_counter()
    pack_documents(docs, 1024, pad_id=0, eos_id=1)
    t_py = time.perf_counter() - t0
    pack_documents_native(docs, 1024, pad_id=0, eos_id=1)  # warm
    t0 = time.perf_counter()
    pack_documents_native(docs, 1024, pad_id=0, eos_id=1)
    t_cc = time.perf_counter() - t0
    # the C++ core should win comfortably at pod-batch scale
    assert t_cc < t_py, (t_cc, t_py)
