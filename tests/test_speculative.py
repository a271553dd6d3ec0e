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
    through the draft-verify decoder (deterministic, stats exposed)."""
    from unidisc_tpu.serving.engine import build_elm_engine

    eng = build_elm_engine(preset="tiny", speculative="tiny", gamma=3)
    res = eng.complete_text("\x01\x02\x03",
                            max_new_tokens=6).result(timeout=600)
    assert isinstance(res["text"], str)
    assert len(res["tokens"]) <= 6
    assert res["drafted"] >= res["accepted"] >= 0
    res2 = eng.complete_text("\x01\x02\x03",
                             max_new_tokens=6).result(timeout=600)
    assert res2["tokens"] == res["tokens"]

    # streaming callback gets the final tokens (burst emission)
    got = []
    eng.complete_text("\x01\x02", max_new_tokens=4,
                      stream_cb=got.append).result(timeout=600)
    assert got and got[0] == eng.complete_text(
        "\x01\x02", max_new_tokens=4).result(timeout=600)["tokens"]
