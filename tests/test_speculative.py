"""Speculative decoding (serving/speculative.py): draft-verify AR decode
in one jitted program. Key invariants: greedy spec decoding is LOSSLESS
(bit-equal to target-only greedy decode for ANY draft); with
draft == target every proposal is accepted; EOS/budget bookkeeping; and
determinism as a pure function of (seed, position). No reference
counterpart (reference decodes token-by-token, model_eval.py:2736)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidisc_tpu.models.elm import ELMConfig, OpenELM, init_elm_cache
from unidisc_tpu.serving.speculative import (elm_spec_decoder,
                                             speculative_decode)

VOCAB = 64


def _elm(num_layers=2, model_dim=48, seed=0, perturb=0.0):
    cfg = ELMConfig(vocab_size=VOCAB, extra_tokens=0, model_dim=model_dim,
                    num_layers=num_layers, head_dim=16,
                    max_length=256)
    # fp32 compute: the losslessness tests compare a jitted program with
    # an eager oracle token-for-token — under bf16, fusion-order numeric
    # noise flips argmaxes at this random model's ~2e-3 logit margins
    model = OpenELM(cfg, compute_dtype=jnp.float32)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids)["params"]
    if perturb:
        leaves, td = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(seed + 100),
                                len(leaves))
        params = jax.tree_util.tree_unflatten(td, [
            l + perturb * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
    return model, cfg, params


def _greedy_oracle(model, cfg, params, prompt, max_new, eos_id=-1):
    """Token-by-token greedy cached decode — the independent oracle."""
    L = len(prompt) + max_new
    kv = init_elm_cache(cfg, 1, L)
    x = jnp.asarray([prompt], jnp.int32)
    logits, kv = model.apply({"params": params}, x, kv_cache=kv,
                             cache_index=jnp.zeros((1,), jnp.int32))
    out = []
    tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)
    pos = len(prompt)
    for _ in range(max_new):
        out.append(int(tok[0]))
        if eos_id >= 0 and out[-1] == eos_id:
            break
        logits, kv = model.apply(
            {"params": params}, tok[:, None].astype(jnp.int32),
            kv_cache=kv,
            cache_index=jnp.full((1,), pos, jnp.int32))
        tok = jnp.argmax(logits[:, 0].astype(jnp.float32), -1)
        pos += 1
    return out


@pytest.mark.parametrize("gamma", [1, 3, 4])
def test_greedy_spec_is_lossless(gamma):
    """Greedy speculative output == target-only greedy decode for an
    arbitrary (even unrelated) draft model, any gamma."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)

    prompts = [[1, 2, 3, 4], [5, 6], [9, 8, 7, 6, 5]]
    max_new = 13
    outs, res = speculative_decode(
        target_model, target_cfg, target_params,
        draft_model, draft_cfg, draft_params,
        prompts, max_new_tokens=max_new, gamma=gamma)
    for p, got in zip(prompts, outs):
        want = _greedy_oracle(target_model, target_cfg, target_params,
                              p, max_new)
        assert got == want, (gamma, p)
    assert int(res.rounds) >= 1
    assert (np.asarray(res.emitted) == max_new).all()


def test_self_draft_accepts_everything():
    """draft == target: every proposal accepted, so the decode finishes
    in ceil(max_new / (gamma+1)) rounds with accepted == drafted."""
    model, cfg, params = _elm(seed=0, perturb=0.05)
    gamma, max_new = 4, 20
    outs, res = speculative_decode(
        model, cfg, params, model, cfg, params,
        [[3, 1, 4, 1, 5], [2, 7, 1, 8]],
        max_new_tokens=max_new, gamma=gamma)
    assert int(res.rounds) == -(-max_new // (gamma + 1))
    # every draft offered in a live round was accepted
    assert int(res.accepted) == int(res.drafted)
    for p, got in zip([[3, 1, 4, 1, 5], [2, 7, 1, 8]], outs):
        want = _greedy_oracle(model, cfg, params, p, max_new)
        assert got == want


def test_self_draft_stochastic_accepts_everything():
    """At temperature > 0 with draft == target the acceptance ratio
    p_t/p_d == 1, so rejection sampling still accepts every draft."""
    model, cfg, params = _elm(seed=0, perturb=0.05)
    gamma, max_new = 3, 12
    outs, res = speculative_decode(
        model, cfg, params, model, cfg, params,
        [[3, 1, 4], [1, 5, 9, 2]], max_new_tokens=max_new,
        gamma=gamma, temperature=1.0, seed=11)
    assert int(res.accepted) == int(res.drafted)
    assert all(len(o) == max_new for o in outs)
    assert all(0 <= t < VOCAB for o in outs for t in o)


def test_stochastic_deterministic_and_seed_sensitive():
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    kw = dict(max_new_tokens=10, gamma=3, temperature=0.8)
    a1, _ = speculative_decode(target_model, target_cfg, target_params,
                               draft_model, draft_cfg, draft_params,
                               [[1, 2, 3]], seed=5, **kw)
    a2, _ = speculative_decode(target_model, target_cfg, target_params,
                               draft_model, draft_cfg, draft_params,
                               [[1, 2, 3]], seed=5, **kw)
    b, _ = speculative_decode(target_model, target_cfg, target_params,
                              draft_model, draft_cfg, draft_params,
                              [[1, 2, 3]], seed=6, **kw)
    assert a1 == a2
    assert a1 != b  # overwhelmingly likely at temp 0.8 over 10 tokens


def test_eos_stops_row():
    """A target that immediately emits EOS stops the row with exactly
    one emitted token; unrelated rows keep their budget."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    prompts = [[1, 2, 3], [4, 5, 6, 7]]
    # find what the oracle emits so we can pick its first token as "EOS"
    first = _greedy_oracle(target_model, target_cfg, target_params,
                           prompts[0], 1)[0]
    outs, res = speculative_decode(
        target_model, target_cfg, target_params,
        draft_model, draft_cfg, draft_params,
        prompts, max_new_tokens=12, gamma=3, eos_id=first)
    assert outs[0] == [first]
    want1 = _greedy_oracle(target_model, target_cfg, target_params,
                           prompts[1], 12, eos_id=first)
    assert outs[1] == want1


def test_per_row_prompt_lengths_and_padding():
    """Right-padded prompts of very different lengths decode exactly as
    their unpadded single-row decodes (pad slots are stale-by-position
    and rewritten before any read)."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    prompts = [[2], [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]]
    outs, _ = speculative_decode(
        target_model, target_cfg, target_params,
        draft_model, draft_cfg, draft_params,
        prompts, max_new_tokens=8, gamma=2)
    for p, got in zip(prompts, outs):
        solo, _ = speculative_decode(
            target_model, target_cfg, target_params,
            draft_model, draft_cfg, draft_params,
            [p], max_new_tokens=8, gamma=2)
        assert got == solo[0]
        assert got == _greedy_oracle(target_model, target_cfg,
                                     target_params, p, 8)


def test_elm_engine_speculative_route():
    """--speculative plumbing: build_elm_engine serves completions
    through the continuous batcher in draft-verify spec rounds
    (deterministic for greedy; streaming works)."""
    from unidisc_tpu.serving.engine import build_elm_engine

    eng = build_elm_engine(preset="tiny", speculative="tiny", gamma=3)
    try:
        res = eng.complete_text("\x01\x02\x03", max_new_tokens=6,
                                seed=5).result(timeout=600)
        assert isinstance(res["text"], str)
        assert len(res["tokens"]) <= 6
        res2 = eng.complete_text("\x01\x02\x03", max_new_tokens=6,
                                 seed=5).result(timeout=600)
        assert res2["tokens"] == res["tokens"]

        # greedy spec-continuous serving is LOSSLESS vs the plain route
        plain = build_elm_engine(preset="tiny")
        try:
            want = plain.complete_text("\x01\x02\x03", max_new_tokens=6,
                                       seed=5).result(timeout=600)
            assert res["tokens"] == want["tokens"]
        finally:
            if plain._continuous is not None:
                plain._continuous.shutdown()

        # incremental streaming arrives and concatenates to the result
        got = []
        r3 = eng.complete_text("\x01\x02", max_new_tokens=4, seed=9,
                               stream_cb=got.append).result(timeout=600)
        streamed = [t for c in got for t in c]
        assert streamed[:len(r3["tokens"])] == r3["tokens"]
    finally:
        if eng._continuous is not None:
            eng._continuous.shutdown()


# ---------------------------------------------------------------------------
# speculative rounds inside the continuous batcher
# ---------------------------------------------------------------------------

def _batcher(model, cfg, params, draft=None, gamma=3, slots=4,
             eos_id=-1):
    from unidisc_tpu.serving.continuous import elm_continuous_batcher
    return elm_continuous_batcher(model, params, cfg, slots=slots,
                                  chunk=8, eos_id=eos_id, draft=draft,
                                  gamma=gamma)


def test_continuous_speculative_greedy_lossless():
    """Continuous batching with speculative rounds: greedy results are
    token-for-token identical to the plain single-token continuous
    batcher, including under slot reuse (more requests than slots)."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)

    prompts = [[1, 2, 3], [4, 5], [9, 8, 7, 6], [2, 2], [5, 1, 4],
               [3, 3, 3, 3]]

    plain = _batcher(target_model, target_cfg, target_params, slots=2)
    spec = _batcher(target_model, target_cfg, target_params,
                    draft=(draft_model, draft_cfg, draft_params),
                    gamma=3, slots=2)
    try:
        want = [plain.submit(p, max_new_tokens=11, seed=100 + i)
                for i, p in enumerate(prompts)]
        got = [spec.submit(p, max_new_tokens=11, seed=100 + i)
               for i, p in enumerate(prompts)]
        for i, (w, g) in enumerate(zip(want, got)):
            wt = w.result(timeout=600)["tokens"]
            gt = g.result(timeout=600)["tokens"]
            assert gt == wt, (i, gt, wt)
    finally:
        plain.shutdown()
        spec.shutdown()


def test_continuous_speculative_eos_and_stream():
    """EOS inside an accepted window retires the row mid-round; stream
    callbacks still deliver every token exactly once."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    # oracle to find a token that will appear early in row 0's stream
    first = _greedy_oracle(target_model, target_cfg, target_params,
                           [1, 2, 3], 3)
    eos = first[2]

    spec = _batcher(target_model, target_cfg, target_params,
                    draft=(draft_model, draft_cfg, draft_params),
                    gamma=3, slots=2, eos_id=eos)
    try:
        chunks = []
        f0 = spec.submit([1, 2, 3], max_new_tokens=12,
                         stream_cb=chunks.append)
        f1 = spec.submit([4, 5, 6], max_new_tokens=12)
        r0 = f0.result(timeout=600)
        r1 = f1.result(timeout=600)
        want0 = _greedy_oracle(target_model, target_cfg, target_params,
                               [1, 2, 3], 12, eos_id=eos)
        if want0 and want0[-1] == eos:
            want0 = want0[:-1]
        assert r0["tokens"] == want0
        streamed = [t for c in chunks for t in c]
        # the stream carries the tokens (possibly incl. the trailing EOS)
        assert streamed[:len(r0["tokens"])] == r0["tokens"]
        want1 = _greedy_oracle(target_model, target_cfg, target_params,
                               [4, 5, 6], 12, eos_id=eos)
        if want1 and want1[-1] == eos:
            want1 = want1[:-1]
        assert r1["tokens"] == want1
    finally:
        spec.shutdown()


def test_continuous_speculative_stochastic_seeded():
    """temperature>0 rows in spec mode: per-seed deterministic, seeds
    differ, and tokens are independent of co-tenancy (resubmitting the
    same seeded request alone gives the same stream)."""
    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    spec = _batcher(target_model, target_cfg, target_params,
                    draft=(draft_model, draft_cfg, draft_params),
                    gamma=2, slots=3)
    try:
        a = spec.submit([1, 2, 3], max_new_tokens=10, temperature=0.9,
                        seed=42)
        b = spec.submit([6, 5], max_new_tokens=10, temperature=0.9,
                        seed=43)
        ra = a.result(timeout=600)["tokens"]
        rb = b.result(timeout=600)["tokens"]
        assert ra != rb
        # same seed, solo tenancy -> identical stream
        a2 = spec.submit([1, 2, 3], max_new_tokens=10, temperature=0.9,
                         seed=42).result(timeout=600)["tokens"]
        assert a2 == ra
        assert all(0 <= t < VOCAB for t in ra + rb)
    finally:
        spec.shutdown()


def test_continuous_speculative_prompt_near_buffer_end():
    """Regression (r3 review finding 2): a prompt admitted with
    prompt_len at/past the spec-mode stop cap L-(gamma+1) must NOT let
    the verify-window write clamp below pos+1 and clobber committed
    tokens — the row retires gracefully (truncated like plain mode
    truncates at L) and co-tenant rows are unaffected."""
    from unidisc_tpu.serving.continuous import elm_continuous_batcher

    target_model, target_cfg, target_params = _elm(seed=0, perturb=0.05)
    draft_model, draft_cfg, draft_params = _elm(
        num_layers=1, model_dim=32, seed=7, perturb=0.05)
    gamma, L = 3, 24  # stop cap = L - (gamma+1) = 20
    spec = elm_continuous_batcher(
        target_model, target_params, target_cfg, slots=2, chunk=8,
        length=L, draft=(draft_model, draft_cfg, draft_params),
        gamma=gamma)
    try:
        long_prompt = list(range(1, 22))  # plen=21 > stop cap 20
        short_prompt = [4, 5, 6]
        f_long = spec.submit(long_prompt, max_new_tokens=8)
        f_short = spec.submit(short_prompt, max_new_tokens=8)
        r_long = f_long.result(timeout=600)
        r_short = f_short.result(timeout=600)
        # the near-end row emits its first sampled token (tok0) and
        # truncates; whatever it returns must be a PREFIX of the oracle
        # stream, never window junk
        want_long = _greedy_oracle(target_model, target_cfg,
                                   target_params, long_prompt, 8)
        assert 1 <= len(r_long["tokens"]) <= 8
        assert r_long["tokens"] == want_long[:len(r_long["tokens"])]
        # the co-tenant row is untouched and completes in full
        want_short = _greedy_oracle(target_model, target_cfg,
                                    target_params, short_prompt, 8)
        assert r_short["tokens"] == want_short
        # a prompt just UNDER the cap still decodes correctly up to it
        edge = list(range(1, 18))  # plen=17, stop=min(17+8,20)=20
        r_edge = spec.submit(edge, max_new_tokens=8).result(timeout=600)
        want_edge = _greedy_oracle(target_model, target_cfg,
                                   target_params, edge, 8)
        assert r_edge["tokens"] == want_edge[:len(r_edge["tokens"])]
        assert len(r_edge["tokens"]) >= 3  # 20 - 17 = 3 positions
    finally:
        spec.shutdown()


def test_dit_ar_engine_speculative_route():
    """DIT-AR counterpart: build_engine(--speculative) serves the causal
    DIT through continuous spec rounds, greedy lossless vs plain."""
    from unidisc_tpu.serving.engine import build_engine

    eng = build_engine(preset="tiny", speculative="tiny", spec_gamma=2,
                       experiments=["ar_baseline"])
    plain = build_engine(preset="tiny", experiments=["ar_baseline"])
    try:
        kw = dict(max_new_tokens=6, seed=3)
        got = eng.complete_text("\x01\x02\x03", **kw).result(timeout=600)
        want = plain.complete_text("\x01\x02\x03",
                                   **kw).result(timeout=600)
        assert got["tokens"] == want["tokens"]
        assert isinstance(got["text"], str)
    finally:
        for e in (eng, plain):
            if getattr(e, "_continuous", None) is not None:
                e._continuous.shutdown()

    # diffusion models reject --speculative with a pointer to --scaffold
    with pytest.raises(ValueError, match="scaffold"):
        build_engine(preset="tiny", speculative="tiny")


# ---------------------------------------------------------------------------
# Prompt-lookup (draft-free) speculative decoding
# ---------------------------------------------------------------------------

def test_lookup_proposals_semantics():
    """lookup_proposals: latest earlier n-gram match wins, continuation
    comes from committed tokens only, rows with no usable match fall
    back to last-token repeats (found=False)."""
    from unidisc_tpu.serving.speculative import lookup_proposals

    # row 0: ... 5 6 7 9 | 5 6 <next> at pos=5 — key (5,6) matched at
    # j=0, continuation = x[2:5] = 7 9 5? gamma=2 -> x[2:4] = (7, 9)
    # row 1: no repeat of the key -> fallback (8 8)
    # row 2: key occurs twice earlier -> LATEST usable match chosen
    x = jnp.asarray([
        [5, 6, 7, 9, 5, 6, 0, 0, 0, 0, 0, 0],
        [1, 2, 3, 4, 7, 8, 0, 0, 0, 0, 0, 0],
        [5, 6, 1, 5, 6, 2, 9, 5, 6, 0, 0, 0],
    ], jnp.int32)
    pos = jnp.asarray([5, 5, 8], jnp.int32)
    drafted, found = lookup_proposals(x, pos, gamma=2, ngram=2)
    np.testing.assert_array_equal(np.asarray(found),
                                  [True, False, True])
    np.testing.assert_array_equal(np.asarray(drafted[0]), [7, 9])
    np.testing.assert_array_equal(np.asarray(drafted[1]), [8, 8])
    # row 2 latest usable match of (5,6) with 2 committed continuation
    # tokens: j=3 -> continuation x[5:7] = (2, 9)
    np.testing.assert_array_equal(np.asarray(drafted[2]), [2, 9])

    # a row too young for a key (pos+1 < ngram) falls back
    drafted3, found3 = lookup_proposals(
        jnp.asarray([[3, 0, 0, 0, 0, 0]], jnp.int32),
        jnp.asarray([0], jnp.int32), gamma=2, ngram=2)
    assert not bool(found3[0])
    np.testing.assert_array_equal(np.asarray(drafted3[0]), [3, 3])


@pytest.mark.parametrize("gamma,ngram", [(2, 2), (4, 2), (8, 3)])
def test_lookup_decoder_lossless_greedy(gamma, ngram):
    """Prompt-lookup decoding is bit-equal to plain greedy decode for
    ANY model (acceptance only changes round count, never tokens)."""
    from unidisc_tpu.serving.speculative import elm_lookup_decoder

    model, cfg, params = _elm(seed=3, perturb=0.05)
    decode = jax.jit(
        lambda p, x, pl, s: elm_lookup_decoder(
            model, cfg, gamma=gamma, ngram=ngram)(p, x, pl, s,
                                                  max_new=12))
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [5, 6], [9, 8, 7, 9, 8]]
    plen = np.asarray([len(p) for p in prompts], np.int32)
    buf = np.zeros((3, 8), np.int32)
    for i, p in enumerate(prompts):
        buf[i, :len(p)] = p
    res = decode(params, jnp.asarray(buf), jnp.asarray(plen),
                 jnp.zeros((3,), jnp.int32))
    toks = np.asarray(res.tokens)
    for i, p in enumerate(prompts):
        want = _greedy_oracle(model, cfg, params, p, 12)
        got = toks[i, plen[i]:plen[i] + int(res.emitted[i])].tolist()
        assert got == want, (gamma, ngram, p)


def test_lookup_decoder_accepts_on_periodic_target():
    """On a target that deterministically continues a period-3 pattern,
    lookup proposals are always right: the decode finishes in ~max_new /
    (gamma+1) rounds with near-full acceptance — the mechanism that
    makes prompt-lookup pay on repetitive/grounded text."""
    from unidisc_tpu.serving.speculative import build_lookup_decoder

    V, PERIOD = 16, 3

    def apply_target(params, tok, kv, cache_index):
        # predict next = (cur + 5) % PERIOD's cycle over tokens {1,2,3}:
        # map cur in {1..3} -> next in {1..3} cyclically; one-hot logits
        nxt = (tok % PERIOD) + 1
        logits = jax.nn.one_hot(nxt, V, dtype=jnp.float32) * 10.0
        return logits, kv

    decode = build_lookup_decoder(apply_target, lambda b, L: (),
                                  gamma=4, ngram=2)
    prompt = [1, 2, 3, 1, 2, 3]
    max_new = 18
    res = jax.jit(lambda p, x, pl, s: decode(p, x, pl, s,
                                             max_new=max_new))(
        (), jnp.asarray([prompt], jnp.int32),
        jnp.asarray([len(prompt)], jnp.int32),
        jnp.zeros((1,), jnp.int32))
    toks = np.asarray(res.tokens)[0]
    want = [(t % PERIOD) + 1 for t in
            [prompt[-1]] + list(toks[len(prompt):len(prompt) + max_new - 1])]
    np.testing.assert_array_equal(toks[len(prompt):len(prompt) + max_new],
                                  want)
    # near-full acceptance: 18 tokens in ~ceil(18/5) rounds plus the
    # ramp-up round (the first key has no gamma-committed continuation
    # yet, so round 1 falls back and advances 1) — vs 18 plain rounds
    assert int(res.rounds) <= 6
    assert int(res.accepted) >= max_new - 6


def test_continuous_lookup_lossless_greedy():
    """Continuous batching with LOOKUP rounds (lookup_ngram=): greedy
    tokens are bit-equal to the plain single-token oracle, including
    under slot reuse and mixed prompt lengths."""
    from unidisc_tpu.serving.continuous import elm_continuous_batcher

    model, cfg, params = _elm(seed=0, perturb=0.05)
    look = elm_continuous_batcher(model, params, cfg, slots=2, chunk=8,
                                  lookup_ngram=2, gamma=3)
    try:
        prompts = [[1, 2, 3, 1, 2, 3, 1], [5, 6], [9, 8, 7, 9, 8],
                   [4, 4, 4, 4]]
        futs = [look.submit(p, max_new_tokens=10) for p in prompts]
        for p, f in zip(prompts, futs):
            got = f.result(timeout=600)["tokens"]
            want = _greedy_oracle(model, cfg, params, p, 10)
            assert got == want, p
    finally:
        look.shutdown()


def test_continuous_lookup_stochastic_seeded():
    """temperature>0 rows under lookup rounds: the delta-draft rejection
    rule keeps tokens a pure function of (seed, position) — a seeded
    request reproduces when resubmitted alone."""
    from unidisc_tpu.serving.continuous import elm_continuous_batcher

    model, cfg, params = _elm(seed=1, perturb=0.05)
    look = elm_continuous_batcher(model, params, cfg, slots=2, chunk=8,
                                  lookup_ngram=2, gamma=3)
    try:
        kw = dict(max_new_tokens=8, temperature=0.9)
        a = look.submit([1, 2, 1, 2], seed=11, **kw)
        b = look.submit([7, 7, 7], seed=12, **kw)
        ta, tb = a.result(timeout=600)["tokens"], \
            b.result(timeout=600)["tokens"]
        # resubmit the first request ALONE: identical stream
        ta2 = look.submit([1, 2, 1, 2], seed=11,
                          **kw).result(timeout=600)["tokens"]
        assert ta == ta2
        assert ta != tb
    finally:
        look.shutdown()


def test_elm_engine_lookup_route():
    """--model elm --speculative lookup[:N] serves draft-free lookup
    speculation through the engine; greedy lossless vs the plain elm
    engine."""
    from unidisc_tpu.serving.engine import build_elm_engine

    eng = build_elm_engine(preset="tiny", speculative="lookup:3",
                           gamma=4)
    plain = build_elm_engine(preset="tiny")
    try:
        assert eng._lookup_ngram == 3 and eng._draft is None
        kw = dict(max_new_tokens=6, seed=2)
        got = eng.complete_text("abcabc", **kw).result(timeout=600)
        want = plain.complete_text("abcabc", **kw).result(timeout=600)
        assert got["tokens"] == want["tokens"]
        # the batcher runs in spec-window mode (stop capped)
        assert eng.continuous._stop_cap == eng.continuous.length - 5
    finally:
        for e in (eng, plain):
            if e._continuous is not None:
                e._continuous.shutdown()


def test_dit_ar_engine_lookup_route():
    """build_engine(--speculative lookup) on a DIT-AR model: lossless
    vs plain, no draft model built."""
    from unidisc_tpu.serving.engine import build_engine

    eng = build_engine(preset="tiny", speculative="lookup",
                       experiments=["ar_baseline"])
    plain = build_engine(preset="tiny", experiments=["ar_baseline"])
    try:
        assert eng._ar_draft is None and eng._lookup_ngram == 2
        kw = dict(max_new_tokens=6, seed=3)
        got = eng.complete_text("\x01\x02\x01\x02", **kw).result(
            timeout=600)
        want = plain.complete_text("\x01\x02\x01\x02", **kw).result(
            timeout=600)
        assert got["tokens"] == want["tokens"]
    finally:
        for e in (eng, plain):
            if getattr(e, "_continuous", None) is not None:
                e._continuous.shutdown()
