"""Rolling diffusion batching (serving/rolling.py): lockstep parity with
the static maskgit sampler, admission-timing determinism, and the
threaded front end."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.sampler import build_sampler
from unidisc_tpu.serving.rolling import (RollingDiffusionBatcher,
                                         build_rolling_sampler)

STEPS = 4


def tiny_setup(cfg_over=None):
    over = {
        "model.text_vocab_size": 61,
        "model.image_vocab_size": 16,
        "model.length": 24,
        "model.txt_length": 8,
        "model.img_length": 16,
        "model.force_argmax_valid_indices": True,
        "model.dropout": 0.0,
        "sampling.steps": STEPS,
        "sampling.predictor": "maskgit",
        "sampling.cfg": 1.5,
    }
    over.update(cfg_over or {})
    cfg = Config.make("tiny").override(**over)
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)

    def forward_logits(params, x, sigma, modality):
        return model.apply({"params": params}, x, sigma, modality=modality)

    return cfg, params, forward_logits


def t2i_rows(cfg, b, seed=0):
    m = cfg.model
    rng = np.random.RandomState(seed)
    x0 = np.zeros((b, m.length), np.int32)
    x0[:, :m.txt_length] = rng.randint(1, 50, (b, m.txt_length))
    unmask = np.zeros((b, m.length), bool)
    unmask[:, :m.txt_length] = True
    modality = np.concatenate(
        [np.zeros((b, m.txt_length), np.int32),
         np.ones((b, m.img_length), np.int32)], -1)
    return x0, unmask, modality


def drive(built, params, state, injected=None, max_chunks=32):
    for _ in range(max_chunks):
        if bool((np.asarray(state.step) >= built.done_at).all()):
            break
        state = (built.step_chunk(params, state, injected) if injected
                 is not None else built.step_chunk(params, state))
    return state


def test_lockstep_parity_with_static_sampler():
    """All slots admitted at once + injected noise == build_sampler
    token-for-token (the same noise arrays feed both paths)."""
    cfg, params, fwd = tiny_setup()
    m = cfg.model
    B = 4
    x0, unmask, modality = t2i_rows(cfg, B)
    V = m.text_vocab_size + m.image_vocab_size

    rng = np.random.RandomState(7)
    injected = {
        "exp": jnp.asarray(rng.exponential(
            size=(STEPS, B, m.length, V)).astype(np.float32)),
        "gumbel": jnp.asarray(-np.log(rng.exponential(
            size=(STEPS, B, m.length))).astype(np.float32)),
    }

    static = build_sampler(fwd, cfg, inject_noise=True)
    ref = static(params, jax.random.PRNGKey(0), jnp.asarray(x0),
                 jnp.asarray(unmask), jnp.asarray(modality),
                 injected=injected)

    built = build_rolling_sampler(fwd, cfg, slots=B, chunk=2,
                                  inject_noise=True)
    state = built.init_state()
    state = built.insert_many(
        state, jnp.arange(B), jnp.asarray(x0), jnp.asarray(unmask),
        jnp.asarray(modality), jnp.zeros((B,), jnp.int32))
    state = drive(built, params, state, injected=injected)

    np.testing.assert_array_equal(np.asarray(state.x),
                                  np.asarray(ref.tokens))


def test_rolling_rows_independent_of_admission_timing():
    """A request's tokens are a pure function of its seed and inputs —
    identical whether it runs alone or admitted mid-flight next to
    other rows at different steps."""
    cfg, params, fwd = tiny_setup()
    B = 3
    x0, unmask, modality = t2i_rows(cfg, B, seed=3)
    built = build_rolling_sampler(fwd, cfg, slots=4, chunk=1)

    def solo(r, seed):
        st = built.init_state()
        st = built.insert_many(
            st, jnp.asarray([0]), jnp.asarray(x0[r:r + 1]),
            jnp.asarray(unmask[r:r + 1]), jnp.asarray(modality[r:r + 1]),
            jnp.asarray([seed], jnp.int32))
        st = drive(built, params, st)
        return np.asarray(st.x[0])

    solos = [solo(r, 10 + r) for r in range(B)]

    # staggered: row0 at step 0; admit row1 after 1 chunk, row2 after 2
    st = built.init_state()
    admit = lambda st, slot, r, seed: built.insert_many(
        st, jnp.asarray([slot]), jnp.asarray(x0[r:r + 1]),
        jnp.asarray(unmask[r:r + 1]), jnp.asarray(modality[r:r + 1]),
        jnp.asarray([seed], jnp.int32))
    st = admit(st, 0, 0, 10)
    st = built.step_chunk(params, st)
    st = admit(st, 1, 1, 11)
    st = built.step_chunk(params, st)
    st = admit(st, 2, 2, 12)
    st = drive(built, params, st)

    for r in range(B):
        np.testing.assert_array_equal(np.asarray(st.x[r]), solos[r])


def test_insert_padding_rows_dropped():
    cfg, params, fwd = tiny_setup()
    built = build_rolling_sampler(fwd, cfg, slots=4, chunk=1)
    x0, unmask, modality = t2i_rows(cfg, 2)
    st = built.init_state()
    # one real row + one padding row (slot == S): padding must not write
    st = built.insert_many(
        st, jnp.asarray([1, 4]), jnp.asarray(x0), jnp.asarray(unmask),
        jnp.asarray(modality), jnp.asarray([5, 6], jnp.int32))
    active = np.asarray(st.active)
    assert active.tolist() == [False, True, False, False]
    # slot 3 (== S-1) untouched — a -1 sentinel would have wrapped here
    assert int(np.asarray(st.step)[3]) == built.done_at


def test_threaded_batcher_matches_state_machine():
    cfg, params, fwd = tiny_setup()
    B = 3
    x0, unmask, modality = t2i_rows(cfg, B, seed=5)
    built = build_rolling_sampler(fwd, cfg, slots=4, chunk=2)

    def solo(r, seed):
        st = built.init_state()
        st = built.insert_many(
            st, jnp.asarray([0]), jnp.asarray(x0[r:r + 1]),
            jnp.asarray(unmask[r:r + 1]), jnp.asarray(modality[r:r + 1]),
            jnp.asarray([seed], jnp.int32))
        st = drive(built, params, st)
        return np.asarray(st.x[0])

    expected = [solo(r, 20 + r) for r in range(B)]

    batcher = RollingDiffusionBatcher(fwd, params, cfg, slots=4, chunk=2)
    try:
        futs = []
        for r in range(B):
            futs.append(batcher.submit(x0[r], unmask[r], modality[r],
                                       seed=20 + r))
            time.sleep(0.05)  # staggered arrivals
        rows = [f.result(timeout=120) for f in futs]
    finally:
        batcher.shutdown()

    for r in range(B):
        np.testing.assert_array_equal(rows[r], expected[r])


def test_rejects_non_maskgit_predictor():
    cfg, params, fwd = tiny_setup({"sampling.predictor": "ddpm"})
    with pytest.raises(ValueError, match="maskgit"):
        build_rolling_sampler(fwd, cfg, slots=2)


def test_engine_rolling_route():
    """InferenceEngine(rolling=N): gen_image requests flow through the
    rolling batcher and decode like the whole-batch path."""
    from unidisc_tpu.serving.engine import InferenceEngine

    cfg = Config.make("tiny").override(**{
        "model.text_vocab_size": 261,
        "model.image_vocab_size": 64,
        "model.length": 48,
        "model.txt_length": 16,
        "model.img_length": 32,
        "model.force_argmax_valid_indices": True,
        "model.dropout": 0.0,
        "sampling.steps": 4,
        "sampling.predictor": "maskgit",
    })
    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    eng = InferenceEngine(cfg, model, params, rolling=4)
    try:
        out = eng.run(text="a red square", task="gen_image", seed=3)
        assert out["image_ids"].shape == (1, cfg.model.img_length)
        assert (out["image_ids"] >= 0).all()
        assert out["nfe"] == 5  # 4 steps + noise removal
        # same seed reproduces through the rolling route
        out2 = eng.run(text="a red square", task="gen_image", seed=3)
        np.testing.assert_array_equal(out["image_ids"], out2["image_ids"])
    finally:
        for b in eng._rolling.values():
            b.shutdown()


def test_mixed_step_counts_share_a_batch():
    """A 2-step fast request and a 4-step request co-resident: each
    row's tokens match its solo run at the same (seed, steps) — the
    capability whole-batch serving cannot offer."""
    cfg, params, fwd = tiny_setup()
    x0, unmask, modality = t2i_rows(cfg, 2, seed=9)
    built = build_rolling_sampler(fwd, cfg, slots=4, chunk=1)

    def solo(r, seed, steps):
        st = built.init_state()
        st = built.insert_many(
            st, jnp.asarray([0]), jnp.asarray(x0[r:r + 1]),
            jnp.asarray(unmask[r:r + 1]), jnp.asarray(modality[r:r + 1]),
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([steps], jnp.int32))
        st = drive(built, params, st)
        return np.asarray(st.x[0])

    ref_fast = solo(0, 30, 2)
    ref_full = solo(1, 31, STEPS)

    st = built.init_state()
    st = built.insert_many(
        st, jnp.asarray([0, 1]), jnp.asarray(x0), jnp.asarray(unmask),
        jnp.asarray(modality), jnp.asarray([30, 31], jnp.int32),
        jnp.asarray([2, STEPS], jnp.int32))
    st = drive(built, params, st)
    step = np.asarray(st.step)
    assert step[0] == 2 + 1 and step[1] == STEPS + 1  # each at ITS finish
    np.testing.assert_array_equal(np.asarray(st.x[0]), ref_fast)
    np.testing.assert_array_equal(np.asarray(st.x[1]), ref_full)


def test_batcher_per_request_steps():
    cfg, params, fwd = tiny_setup()
    x0, unmask, modality = t2i_rows(cfg, 2, seed=11)
    built = build_rolling_sampler(fwd, cfg, slots=4, chunk=2)

    def solo(r, seed, steps):
        st = built.init_state()
        st = built.insert_many(
            st, jnp.asarray([0]), jnp.asarray(x0[r:r + 1]),
            jnp.asarray(unmask[r:r + 1]), jnp.asarray(modality[r:r + 1]),
            jnp.asarray([seed], jnp.int32),
            jnp.asarray([steps], jnp.int32))
        st = drive(built, params, st)
        return np.asarray(st.x[0])

    expected = [solo(0, 40, 2), solo(1, 41, STEPS)]
    batcher = RollingDiffusionBatcher(fwd, params, cfg, slots=4, chunk=2)
    try:
        f0 = batcher.submit(x0[0], unmask[0], modality[0], seed=40, steps=2)
        f1 = batcher.submit(x0[1], unmask[1], modality[1], seed=41)
        rows = [f0.result(timeout=120), f1.result(timeout=120)]
    finally:
        batcher.shutdown()
    np.testing.assert_array_equal(rows[0], expected[0])
    np.testing.assert_array_equal(rows[1], expected[1])
    b2 = RollingDiffusionBatcher(fwd, params, cfg, slots=2)
    try:
        with pytest.raises(ValueError, match="steps"):
            b2.submit(x0[0], unmask[0], steps=99)
    finally:
        b2.shutdown()


# ---------------------------------------------------------------------------
# span-factored t2i rolling


def t2i_setup():
    cfg, params, fwd = tiny_setup()
    from unidisc_tpu.models.dit import init_dit as _init
    model, _ = _init(jax.random.PRNGKey(0), cfg.model)
    return cfg, params, model


def test_rolling_t2i_lockstep_parity_with_static():
    """Rolling t2i (all admitted at once, injected noise) ==
    build_t2i_sampler(inject_noise=True) token-for-token."""
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    from unidisc_tpu.serving.rolling import build_rolling_t2i

    cfg, params, model = t2i_setup()
    m = cfg.model
    B = 3
    Vi = m.image_vocab_size
    txt = np.random.RandomState(2).randint(
        1, 50, (B, m.txt_length)).astype(np.int32)
    rng = np.random.RandomState(8)
    injected = {
        "gumbel_tok": jnp.asarray(-np.log(rng.exponential(
            size=(STEPS, B, m.img_length, Vi))).astype(np.float32)),
        "gumbel_conf": jnp.asarray(-np.log(rng.exponential(
            size=(STEPS, B, m.img_length))).astype(np.float32)),
    }
    static = build_t2i_sampler(model, cfg, inject_noise=True)
    ref = static(params, jax.random.PRNGKey(0), jnp.asarray(txt),
                 injected=injected)

    built = build_rolling_t2i(model, cfg, slots=B, chunk=2,
                              inject_noise=True)
    st = built.init_state()
    st = built.insert_many(st, jnp.arange(B), jnp.asarray(txt),
                           jnp.zeros((B,), jnp.int32))
    st = drive(built, params, st, injected=injected)
    np.testing.assert_array_equal(np.asarray(st.x),
                                  np.asarray(ref.tokens))


def test_rolling_t2i_staggered_determinism_and_ragged_steps():
    from unidisc_tpu.serving.rolling import build_rolling_t2i

    cfg, params, model = t2i_setup()
    m = cfg.model
    txt = np.random.RandomState(4).randint(
        1, 50, (2, m.txt_length)).astype(np.int32)
    built = build_rolling_t2i(model, cfg, slots=4, chunk=1)

    def solo(r, seed, steps):
        st = built.init_state()
        st = built.insert_many(st, jnp.asarray([0]),
                               jnp.asarray(txt[r:r + 1]),
                               jnp.asarray([seed], jnp.int32),
                               jnp.asarray([steps], jnp.int32))
        st = drive(built, params, st)
        return np.asarray(st.x[0])

    ref0 = solo(0, 50, 2)           # fast 2-step request
    ref1 = solo(1, 51, STEPS)       # full-step request

    st = built.init_state()
    st = built.insert_many(st, jnp.asarray([0]), jnp.asarray(txt[:1]),
                           jnp.asarray([50], jnp.int32),
                           jnp.asarray([2], jnp.int32))
    st = built.step_chunk(params, st)     # row0 mid-flight
    st = built.insert_many(st, jnp.asarray([1]), jnp.asarray(txt[1:]),
                           jnp.asarray([51], jnp.int32),
                           jnp.asarray([STEPS], jnp.int32))
    st = drive(built, params, st)
    np.testing.assert_array_equal(np.asarray(st.x[0]), ref0)
    np.testing.assert_array_equal(np.asarray(st.x[1]), ref1)
    # text spans stay clamped
    np.testing.assert_array_equal(np.asarray(st.x[:2, :m.txt_length]), txt)


def test_steps_one_schedule_reveals_everything():
    """steps=1: the ragged schedule must put the whole budget on the
    single step (the 0/0-frac guard), not NaN into a zero budget."""
    from unidisc_tpu.serving.rolling import adaptive_schedule_ragged

    sche = adaptive_schedule_ragged(
        jnp.asarray([16, 7]), jnp.asarray([1, 1]), 4, "arccos")
    assert np.asarray(sche)[:, 0].tolist() == [16, 7]
    assert np.asarray(sche)[:, 1:].sum() == 0

    # and end-to-end: a 1-step request completes fully unmasked
    cfg, params, fwd = tiny_setup()
    x0, unmask, modality = t2i_rows(cfg, 1)
    built = build_rolling_sampler(fwd, cfg, slots=2, chunk=2)
    st = built.init_state()
    st = built.insert_many(
        st, jnp.asarray([0]), jnp.asarray(x0), jnp.asarray(unmask),
        jnp.asarray(modality), jnp.asarray([1], jnp.int32),
        jnp.asarray([1], jnp.int32))
    st = drive(built, params, st)
    assert (np.asarray(st.x[0]) != cfg.model.mask_index).all()


def test_worker_crash_fails_futures_not_hangs():
    """A device error inside the worker must set_exception on every
    owned/pending future (the engine would otherwise block 10 min)."""
    cfg, params, fwd = tiny_setup()
    x0, unmask, modality = t2i_rows(cfg, 1)
    batcher = RollingDiffusionBatcher(fwd, params, cfg, slots=2, chunk=2)
    try:
        boom = RuntimeError("injected device failure")

        def exploding(*a, **k):
            raise boom

        batcher.built = batcher.built._replace(step_chunk=exploding)
        fut = batcher.submit(x0[0], unmask[0], modality[0], seed=0)
        with pytest.raises(RuntimeError, match="injected device"):
            fut.result(timeout=30)
        # the worker recovered: restore the chunk fn and serve again
        from unidisc_tpu.serving.rolling import build_rolling_sampler as b
        batcher.built = b(fwd, cfg, slots=2, chunk=2)
        batcher.state = batcher.built.init_state()
        out = batcher.submit(x0[0], unmask[0], modality[0],
                             seed=0).result(timeout=120)
        assert out.shape == (cfg.model.length,)
    finally:
        batcher.shutdown()


def test_shutdown_fails_outstanding_futures():
    cfg, params, fwd = tiny_setup()
    x0, unmask, modality = t2i_rows(cfg, 1)
    batcher = RollingDiffusionBatcher(fwd, params, cfg, slots=2, chunk=1)
    fut = batcher.submit(x0[0], unmask[0], modality[0], seed=0)
    batcher.shutdown()
    # either it finished before shutdown or it failed — never hangs
    try:
        r = fut.result(timeout=5)
        assert r.shape == (cfg.model.length,)
    except RuntimeError as e:
        assert "shut down" in str(e)
    with pytest.raises(RuntimeError, match="shut down"):
        batcher.submit(x0[0], unmask[0], modality[0])
