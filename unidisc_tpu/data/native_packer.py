"""ctypes binding for the C++ interleaved-document packer.

native/packer.cpp is the throughput twin of interleaved.pack_documents
(semantics are bit-identical — tests/test_native_packer.py fuzzes both);
use it on pod-scale hosts where packing hundreds of ragged web documents
per step is Python-loop-bound. Builds on demand with g++ (no pybind11 in
the image; plain C ABI + ctypes), caches the .so next to the source, and
``pack_documents_native`` transparently falls back to the Python packer
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

from unidisc_tpu.data.interleaved import Document, PackedBatch, \
    pack_documents

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "packer.cpp")
_LIB_PATH = _SRC[:-4] + ".so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH) or
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     _SRC, "-o", _LIB_PATH],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.pack_documents_i32.restype = ctypes.c_int32
            lib.pack_documents_i32.argtypes = [i32p] * 5 + \
                [ctypes.c_int32] * 5 + [i32p] * 5 + [ctypes.c_int32]
            _lib = lib
        except Exception:  # noqa: BLE001 — no compiler / bad toolchain
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pack_documents_native(docs: Sequence[Document], length: int, *,
                          pad_id: int, eos_id: Optional[int] = None,
                          batch_size: Optional[int] = None,
                          rope_offsets: Optional[dict] = None
                          ) -> PackedBatch:
    """Drop-in replacement for interleaved.pack_documents."""
    lib = _load()
    if lib is None:
        return pack_documents(docs, length, pad_id=pad_id, eos_id=eos_id,
                              batch_size=batch_size,
                              rope_offsets=rope_offsets)

    seg_ids, seg_len, seg_kind, seg_doc, seg_base = [], [], [], [], []
    for d, doc in enumerate(docs):
        for seg in doc.segments:
            ids = np.asarray(seg.ids, np.int32).reshape(-1)
            seg_ids.append(ids)
            seg_len.append(len(ids))
            is_img = seg.kind == "image"
            seg_kind.append(1 if is_img else 0)
            seg_doc.append(d)
            seg_base.append(
                rope_offsets[len(ids)]
                if (is_img and rope_offsets is not None) else 0)
    n_segs = len(seg_len)
    flat = np.concatenate(seg_ids) if seg_ids else np.zeros(0, np.int32)
    flat = np.ascontiguousarray(flat, np.int32)
    arr = lambda x: np.ascontiguousarray(np.asarray(x, np.int32))
    seg_len_a, seg_kind_a = arr(seg_len), arr(seg_kind)
    seg_doc_a, seg_base_a = arr(seg_doc), arr(seg_base)

    max_rows = max(len(docs), 1)
    out_shape = (max_rows, length)
    input_ids = np.empty(out_shape, np.int32)
    modality = np.empty(out_shape, np.int32)
    sample_ids = np.empty(out_shape, np.int32)
    rope_index = np.empty(out_shape, np.int32)
    img_block_index = np.empty(out_shape, np.int32)

    b = lib.pack_documents_i32(
        _ptr(flat), _ptr(seg_len_a), _ptr(seg_kind_a), _ptr(seg_doc_a),
        _ptr(seg_base_a),
        ctypes.c_int32(n_segs), ctypes.c_int32(len(docs)),
        ctypes.c_int32(length), ctypes.c_int32(pad_id),
        ctypes.c_int32(-1 if eos_id is None else eos_id),
        _ptr(input_ids), _ptr(modality), _ptr(sample_ids), _ptr(rope_index),
        _ptr(img_block_index), ctypes.c_int32(max_rows))
    if b < 0:
        raise ValueError("native packer failed (malformed segments)")

    def fit(a, fill):
        a = a[:b]
        if batch_size is not None:
            if b < batch_size:
                pad = np.full((batch_size - b, length), fill, np.int32)
                a = np.concatenate([a, pad], 0)
            a = a[:batch_size]
        return a

    input_ids = fit(input_ids, pad_id)
    modality = fit(modality, 0)
    sample_ids = fit(sample_ids, -1)
    rope_index = fit(rope_index, 0)
    img_block_index = fit(img_block_index, 0)
    return PackedBatch(
        input_ids=input_ids, modality=modality, sample_ids=sample_ids,
        rope_index=rope_index, img_block_index=img_block_index,
        attention_mask=(sample_ids >= 0))
