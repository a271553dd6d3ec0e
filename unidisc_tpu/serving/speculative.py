"""Speculative decoding for the AR serving path (draft-verify).

AR decode is weight-bandwidth-bound (BASELINE.md: int8 weights alone gave
1.65x because each emitted token costs one full read of the model), so
the next lever is emitting MULTIPLE tokens per target-model read: a small
draft model proposes `gamma` tokens autoregressively, the target scores
all of them in ONE chunked cached forward, and the longest valid prefix
is accepted (Leviathan et al. 2023 rejection-sampling scheme — lossless:
the output distribution equals target-only decoding).

No reference counterpart (the reference decodes token-by-token,
model_eval.py:2736-2822). TPU-native design:

- The whole decode — prefill of both models, every draft/verify round,
  acceptance, EOS bookkeeping — is ONE jitted program (`lax.while_loop`
  over spec rounds, `lax.scan` over draft steps inside); zero host
  round-trips until the final buffer transfer.
- Per-row positions ride the (B,) `cache_index` vector path that the
  DIT/ELM cached forwards already support for continuous batching, so
  rows accept different counts per round without rebatching.
- NO cache rollback: rejected-position K/V slots are stale but every
  subsequent chunk write starts at the row's committed position and
  covers them before any query can read them (queries attend only to
  slots <= their own position, and a slot equal to the query's position
  is written in the same forward, before attention).
- Randomness is a pure function of (row seed, absolute position), so
  results are independent of batch co-tenancy and, at temperature 0,
  bit-equal to plain greedy target decoding.

apply_fn contract (same as serving/continuous.py):
    apply_fn(params, tok (B, l), kv, cache_index (B,)) ->
        (logits (B, l, V) fp32, new_kv)
cache_factory(batch, length) -> fresh KV pytree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class SpecResult(NamedTuple):
    tokens: jax.Array       # (B, L) full buffer: prompt + generated
    emitted: jax.Array      # (B,) generated-token counts (incl. EOS)
    rounds: jax.Array       # () spec rounds executed
    accepted: jax.Array     # () total accepted DRAFT tokens (stats)
    drafted: jax.Array      # () total drafted tokens offered (stats)


def spec_key(seed, pos, tag):
    """The speculative-path RNG law: fold (position, stream-tag, row
    seed) into PRNGKey(0). Shared with the continuous batcher's spec
    rounds so both paths draw identical noise for the same (seed,
    position) — the determinism contract."""
    k = jax.random.fold_in(jax.random.PRNGKey(0), pos)
    k = jax.random.fold_in(k, tag)
    return jax.random.fold_in(k, seed)


def _gumbel(seed, pos, tag, shape):
    """Per-(row-seed, absolute-position) Gumbel noise — a pure function
    of its arguments so acceptance patterns cannot change what any row
    samples (same contract as serving/rolling.py)."""
    return jax.random.gumbel(spec_key(seed, pos, tag), shape, jnp.float32)


def _uniform(seed, pos, tag):
    return jax.random.uniform(spec_key(seed, pos, tag), (), jnp.float32,
                              minval=1e-20)


def accept_window(drafted, lp_d, lg_t, lp_t, *, stoch, u=None,
                  g_corr=None, bonus=None):
    """The Leviathan accept/correct core, shared by build_spec_decoder
    and the continuous batcher's _spec_round (the SINGLE source of the
    losslessness guarantee — edit here, both paths follow).

    drafted (B, gamma) proposals; lp_d (B, gamma, V) draft log-probs;
    lg_t (B, gamma+1, V) target logits; lp_t matching log-probs (both
    already temperature-scaled and vocabulary-restricted). stoch selects
    the rejection-sampling rule: statically (Python bool — the greedy
    branch compiles away) or per-row ((B,) bool). Stochastic use needs
    u (B, gamma) uniforms for the accept rule, g_corr (B, gamma, V)
    Gumbel noise for the residual draw, and bonus (B,) a pre-sampled
    token for the all-accepted slot.

    Returns (win (B, gamma+1), n (B,)): win[:, :n] are accepted drafts,
    win[:, n] is the target's correction/bonus; n = accepted count."""
    gamma = drafted.shape[1]
    targets = jnp.argmax(lg_t, -1).astype(jnp.int32)   # (B, gamma+1)

    def stochastic_parts():
        take = lambda lp, d: jnp.take_along_axis(lp, d[..., None],
                                                 -1)[..., 0]
        # accept d_i with prob min(1, p_t(d_i)/p_d(d_i))
        match = jnp.log(u) < (take(lp_t[:, :gamma], drafted)
                              - take(lp_d, drafted))
        # residual distribution normalize(max(p_t - p_d, 0)) at each
        # rejection slot; plain p_t at the bonus slot
        p_res = jnp.maximum(jnp.exp(lp_t[:, :gamma]) - jnp.exp(lp_d), 0.0)
        log_res = jnp.log(jnp.maximum(p_res, 1e-38))
        corr = jnp.argmax(log_res + g_corr, -1).astype(jnp.int32)
        out = jnp.concatenate([corr, bonus[:, None]], 1)
        return match, out

    if stoch is False:
        match = drafted == targets[:, :gamma]
        out_win = targets
    elif stoch is True:
        match, out_win = stochastic_parts()
    else:
        match_s, out_s = stochastic_parts()
        match = jnp.where(stoch[:, None], match_s,
                          drafted == targets[:, :gamma])
        out_win = jnp.where(stoch[:, None], out_s, targets)

    led = jnp.cumprod(match.astype(jnp.int32), -1)
    n = led.sum(-1)                                    # (B,) in [0, gamma]
    idx = jnp.arange(gamma + 1)[None, :]
    win = jnp.where(idx < n[:, None],
                    jnp.pad(drafted, ((0, 0), (0, 1))), out_win)
    return win, n


def build_spec_decoder(apply_target: Callable, cache_factory_t: Callable,
                       apply_draft: Callable, cache_factory_d: Callable,
                       *, gamma: int = 4, temperature: float = 0.0,
                       eos_id: int = -1,
                       max_length: Optional[int] = None) -> Callable:
    """Build the jitted-able speculative decoder.

    Returns decode(params_t, params_d, prompts (B, Lp) int32,
                   plen (B,) int32, seeds (B,) int32, max_new: static)
    -> SpecResult. Prompts are right-padded; pad slots poison only cache
    positions that are rewritten before first read (see module note).
    max_length: the models' position-table bound — decode refuses
    buffers longer than it (positions past the RoPE table would silently
    clamp to the last rotary angle and degrade instead of erroring).
    """
    assert gamma >= 1
    greedy = temperature <= 0.0
    inv_t = 0.0 if greedy else 1.0 / temperature

    def sample_from(logits, seed, pos, tag):
        """One token from logits (V,) at absolute position pos."""
        if greedy:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        g = _gumbel(seed, pos, tag, logits.shape)
        return jnp.argmax(logits * inv_t + g, -1).astype(jnp.int32)

    v_sample = jax.vmap(sample_from, in_axes=(0, 0, 0, None))

    def decode(params_t, params_d, prompts, plen, seeds,
               max_new: int) -> SpecResult:
        B, Lp = prompts.shape
        L = Lp + max_new + gamma + 1
        if max_length is not None and L > max_length:
            raise ValueError(
                f"prompt {Lp} + max_new {max_new} + gamma+1 {gamma + 1} "
                f"= {L} exceeds the models' max_length {max_length}: "
                "RoPE positions past the table would clamp silently")
        x = jnp.zeros((B, L), jnp.int32).at[:, :Lp].set(prompts)
        kv_t = cache_factory_t(B, L)
        kv_d = cache_factory_d(B, L)

        # prefill BOTH models on the whole padded prompt chunk; per-row
        # valid length rides the causal mask + stale-slot overwrites
        zero = jnp.zeros((B,), jnp.int32)
        _, kv_t = apply_target(params_t, prompts, kv_t, zero)
        _, kv_d = apply_draft(params_d, prompts, kv_d, zero)

        pos0 = plen - 1          # index of the next input token
        state = (x, pos0, jnp.zeros((B,), jnp.int32),        # emitted
                 jnp.zeros((B,), bool),                      # finished
                 kv_t, kv_d,
                 jnp.zeros((), jnp.int32),                   # rounds
                 jnp.zeros((), jnp.int32),                   # accepted
                 jnp.zeros((), jnp.int32))                   # drafted

        def cond(state):
            _, _, emitted, finished = state[:4]
            return ~jnp.all(finished | (emitted >= max_new))

        def body(state):
            x, pos, emitted, finished, kv_t, kv_d, rounds, acc_n, dr_n = \
                state

            cur = jnp.take_along_axis(x, pos[:, None], 1)[:, 0]

            # ---- draft phase: gamma+1 cached single-token steps ------
            # (the +1 feeds d_gamma so the draft cache has no hole at
            # the bonus position when every draft is accepted; the extra
            # proposal itself is discarded)
            def draft_step(carry, i):
                kv_d, tok = carry
                logits, kv_d = apply_draft(params_d, tok[:, None], kv_d,
                                           pos + i)
                lg = logits[:, 0].astype(jnp.float32)
                nxt = v_sample(lg, seeds, pos + i + 1, 1)
                lp = jax.nn.log_softmax(lg * (1.0 if greedy else inv_t),
                                        -1)
                return (kv_d, nxt), (nxt, lp)

            (kv_d, _), (drafted, lp_d) = jax.lax.scan(
                draft_step, (kv_d, cur), jnp.arange(gamma + 1))
            drafted = drafted.T[:, :gamma]            # (B, gamma)
            lp_d = jnp.swapaxes(lp_d, 0, 1)[:, :gamma]  # (B, gamma, V)

            # ---- verify: ONE target forward over gamma+1 tokens ------
            chunk = jnp.concatenate([cur[:, None], drafted], 1)
            logits_t, kv_t = apply_target(params_t, chunk, kv_t, pos)
            lg_t = logits_t.astype(jnp.float32)       # (B, gamma+1, V)
            lp_t = jax.nn.log_softmax(
                lg_t * (1.0 if greedy else inv_t), -1)

            if greedy:
                win, n = accept_window(drafted, lp_d, lg_t, lp_t,
                                       stoch=False)
            else:
                nxt = pos[:, None] + jnp.arange(gamma)[None, :] + 1
                u = jax.vmap(jax.vmap(
                    _uniform, in_axes=(None, 0, None)),
                    in_axes=(0, 0, None))(seeds, nxt, 2)
                g_corr = jax.vmap(jax.vmap(
                    lambda s, p: _gumbel(s, p, 3, (lp_t.shape[-1],)),
                    in_axes=(None, 0)), in_axes=(0, 0))(seeds, nxt)
                bonus = v_sample(lg_t[:, gamma], seeds,
                                 pos + gamma + 1, 4)
                win, n = accept_window(drafted, lp_d, lg_t, lp_t,
                                       stoch=True, u=u, g_corr=g_corr,
                                       bonus=bonus)
            # win[:, :n] = accepted drafts, win[:, n] = the target's
            # correction/bonus; only slots <= n are real this round
            idx = jnp.arange(gamma + 1)[None, :]
            real = idx <= n[:, None]

            # EOS + budget: cut the advance at the first EOS and at the
            # per-row remaining budget
            remaining = jnp.maximum(max_new - emitted, 0)
            adv = jnp.minimum(n + 1, remaining)
            if eos_id >= 0:
                is_eos = (win == eos_id) & real
                any_eos = is_eos.any(-1)
                first_eos = jnp.argmax(is_eos, -1)
                adv = jnp.where(any_eos,
                                jnp.minimum(adv, first_eos + 1), adv)
            adv = jnp.where(finished, 0, adv)

            # write the whole window at pos+1; junk beyond the advance
            # sits at positions the next rounds rewrite first. Buffer
            # sizing guarantees unfinished rows fit; finished rows (whose
            # start may clamp) write their existing contents back.
            start = jnp.minimum(pos + 1, L - (gamma + 1))
            cur_win = jax.vmap(
                lambda row, p: jax.lax.dynamic_slice(row, (p,),
                                                     (gamma + 1,)))(
                x, start)
            keep = jnp.where(finished[:, None], cur_win, win)
            x = jax.vmap(lambda row, w, p: jax.lax.dynamic_update_slice(
                row, w, (p,)))(x, keep, start)

            emitted = emitted + adv
            new_fin = finished | (emitted >= max_new)
            if eos_id >= 0:
                hit = (jnp.take_along_axis(
                    win, jnp.clip(adv - 1, 0, gamma)[:, None], 1)[:, 0]
                    == eos_id) & (adv > 0)
                new_fin = new_fin | hit
            pos = pos + adv
            return (x, pos, emitted, new_fin, kv_t, kv_d, rounds + 1,
                    acc_n + jnp.where(finished, 0,
                                      jnp.minimum(n, adv)).sum(),
                    dr_n + jnp.where(finished, 0, gamma).sum())

        x, pos, emitted, finished, kv_t, kv_d, rounds, acc_n, dr_n = \
            jax.lax.while_loop(cond, body, state)
        return SpecResult(tokens=x, emitted=emitted, rounds=rounds,
                          accepted=acc_n, drafted=dr_n)

    return decode


def lookup_proposals(x, pos, *, gamma: int, ngram: int):
    """Draft-free proposals by PROMPT LOOKUP (n-gram continuation): for
    each row, find the latest earlier occurrence of the last `ngram`
    committed tokens in the row's own buffer and propose the `gamma`
    tokens that followed it (Saxena 2023 prompt-lookup decoding; the
    trick behind assisted generation on repetitive/grounded text —
    summarization, code edits, RAG).

    x (B, L) int32 buffer, pos (B,) index of the last committed token.
    Returns (drafted (B, gamma) int32, found (B,) bool). Rows with no
    usable match propose the last token repeated (correctness is
    unaffected — greedy verification accepts only true continuations;
    an all-rejected round still advances 1 token like plain decode).

    All shapes are static: the candidate scan is a (B, L-ngram+1, ngram)
    equality — pure VPU work, negligible next to the verify forward."""
    B, L = x.shape
    # sliding windows via STATIC slices: windows[:, j] = x[:, j:j+ngram]
    windows = jnp.stack([x[:, k:L - ngram + 1 + k]
                         for k in range(ngram)], -1)
    key = jax.vmap(lambda row, p: jax.lax.dynamic_slice(
        row, (p,), (ngram,)))(x, jnp.maximum(pos - ngram + 1, 0))
    match = jnp.all(windows == key[:, None, :], -1)   # (B, L-ngram+1)
    j = jnp.arange(L - ngram + 1)[None, :]
    # a usable match needs its full gamma-token continuation committed
    # (j + ngram + gamma - 1 <= pos) — which also makes it strictly
    # earlier than the key's own occurrence for gamma >= 1
    usable = match & (j <= (pos - ngram - gamma + 1)[:, None]) \
        & ((pos - ngram + 1) >= 0)[:, None]
    found = usable.any(-1)
    # LATEST usable match: argmax of j over usable positions
    j_star = jnp.argmax(jnp.where(usable, j, -1), -1)
    cont = jax.vmap(lambda row, p: jax.lax.dynamic_slice(
        row, (p,), (gamma,)))(x, jnp.clip(j_star + ngram, 0, L - gamma))
    cur = jnp.take_along_axis(x, pos[:, None], 1)
    drafted = jnp.where(found[:, None], cont,
                        jnp.broadcast_to(cur, (B, gamma)))
    return drafted.astype(jnp.int32), found


def build_lookup_decoder(apply_target: Callable, cache_factory_t: Callable,
                         *, gamma: int = 8, ngram: int = 2,
                         eos_id: int = -1,
                         max_length: Optional[int] = None) -> Callable:
    """Draft-FREE speculative decoder: proposals come from
    `lookup_proposals` (n-gram self-continuation) instead of a draft
    model, so every round costs exactly ONE target forward over gamma+1
    tokens — no second model, no draft cache, no extra weights resident
    in HBM. Greedy only (temperature 0): the proposal is deterministic,
    so acceptance is exact-match and the output is bit-equal to plain
    greedy decoding by construction.

    Returns decode(params_t, prompts (B, Lp), plen (B,), seeds (B,),
    max_new: static) -> SpecResult. seeds are accepted for signature
    compatibility and unused (greedy)."""
    assert gamma >= 1 and ngram >= 1

    def decode(params_t, prompts, plen, seeds, max_new: int) -> SpecResult:
        B, Lp = prompts.shape
        L = Lp + max_new + gamma + 1
        if max_length is not None and L > max_length:
            raise ValueError(
                f"prompt {Lp} + max_new {max_new} + gamma+1 {gamma + 1} "
                f"= {L} exceeds the model's max_length {max_length}")
        x = jnp.zeros((B, L), jnp.int32).at[:, :Lp].set(prompts)
        kv_t = cache_factory_t(B, L)
        zero = jnp.zeros((B,), jnp.int32)
        _, kv_t = apply_target(params_t, prompts, kv_t, zero)

        state = (x, plen - 1, jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B,), bool), kv_t,
                 jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32))

        def cond(state):
            _, _, emitted, finished = state[:4]
            return ~jnp.all(finished | (emitted >= max_new))

        def body(state):
            x, pos, emitted, finished, kv_t, rounds, acc_n, dr_n = state
            cur = jnp.take_along_axis(x, pos[:, None], 1)[:, 0]

            drafted, _found = lookup_proposals(x, pos, gamma=gamma,
                                               ngram=ngram)

            chunk = jnp.concatenate([cur[:, None], drafted], 1)
            logits_t, kv_t = apply_target(params_t, chunk, kv_t, pos)
            lg_t = logits_t.astype(jnp.float32)
            win, n = accept_window(drafted, None, lg_t, None, stoch=False)
            idx = jnp.arange(gamma + 1)[None, :]
            real = idx <= n[:, None]

            remaining = jnp.maximum(max_new - emitted, 0)
            adv = jnp.minimum(n + 1, remaining)
            if eos_id >= 0:
                is_eos = (win == eos_id) & real
                any_eos = is_eos.any(-1)
                first_eos = jnp.argmax(is_eos, -1)
                adv = jnp.where(any_eos,
                                jnp.minimum(adv, first_eos + 1), adv)
            adv = jnp.where(finished, 0, adv)

            start = jnp.minimum(pos + 1, L - (gamma + 1))
            cur_win = jax.vmap(
                lambda row, p: jax.lax.dynamic_slice(row, (p,),
                                                     (gamma + 1,)))(
                x, start)
            keep = jnp.where(finished[:, None], cur_win, win)
            x = jax.vmap(lambda row, w, p: jax.lax.dynamic_update_slice(
                row, w, (p,)))(x, keep, start)

            emitted = emitted + adv
            new_fin = finished | (emitted >= max_new)
            if eos_id >= 0:
                hit = (jnp.take_along_axis(
                    win, jnp.clip(adv - 1, 0, gamma)[:, None], 1)[:, 0]
                    == eos_id) & (adv > 0)
                new_fin = new_fin | hit
            pos = pos + adv
            # drafted counts gamma per LIVE round unconditionally (same
            # as build_spec_decoder) — fallback rounds offered proposals
            # too, and their accepted tokens count toward acc_n, so the
            # accept_rate = accepted/drafted stat stays <= 1
            return (x, pos, emitted, new_fin, kv_t, rounds + 1,
                    acc_n + jnp.where(finished, 0,
                                      jnp.minimum(n, adv)).sum(),
                    dr_n + jnp.where(finished, 0, gamma).sum())

        x, pos, emitted, finished, kv_t, rounds, acc_n, dr_n = \
            jax.lax.while_loop(cond, body, state)
        return SpecResult(tokens=x, emitted=emitted, rounds=rounds,
                          accepted=acc_n, drafted=dr_n)

    return decode


# ---------------------------------------------------------------------------
# ELM convenience wiring
# ---------------------------------------------------------------------------

def elm_spec_decoder(target_model, target_cfg, draft_model, draft_cfg,
                     *, gamma: int = 4, temperature: float = 0.0,
                     eos_id: int = -1,
                     kv_dtype=jnp.bfloat16) -> Callable:
    """Speculative decoder over two OpenELM models (models/elm.py). The
    draft must share the target's vocabulary. Returns
    decode(params_t, params_d, prompts, plen, seeds, max_new)."""
    from unidisc_tpu.models.elm import init_elm_cache

    def apply_of(model):
        def apply_fn(params, tok, kv, cache_index):
            logits, kv = model.apply({"params": params}, tok,
                                     kv_cache=kv, cache_index=cache_index)
            return logits, kv
        return apply_fn

    total_v = target_cfg.vocab_size + target_cfg.extra_tokens
    assert draft_cfg.vocab_size + draft_cfg.extra_tokens == total_v, \
        "draft and target must share the vocabulary"

    def factory_of(cfg):
        quant = getattr(cfg, "kv_cache_dtype", None) == "int8"
        return lambda b, L: init_elm_cache(cfg, b, L, dtype=kv_dtype,
                                           quant=quant)

    return build_spec_decoder(
        apply_of(target_model), factory_of(target_cfg),
        apply_of(draft_model), factory_of(draft_cfg),
        gamma=gamma, temperature=temperature, eos_id=eos_id,
        # RoPE tables end at max_length — refuse buffers past the
        # shorter of the two models' tables instead of clamping angles
        max_length=min(target_cfg.max_length, draft_cfg.max_length))


def elm_lookup_decoder(target_model, target_cfg, *, gamma: int = 8,
                       ngram: int = 2, eos_id: int = -1,
                       kv_dtype=jnp.bfloat16) -> Callable:
    """Prompt-lookup (draft-free) decoder over one OpenELM model.
    Returns decode(params_t, prompts, plen, seeds, max_new)."""
    from unidisc_tpu.models.elm import init_elm_cache

    def apply_fn(params, tok, kv, cache_index):
        logits, kv = target_model.apply({"params": params}, tok,
                                        kv_cache=kv,
                                        cache_index=cache_index)
        return logits, kv

    quant = getattr(target_cfg, "kv_cache_dtype", None) == "int8"
    factory = lambda b, L: init_elm_cache(target_cfg, b, L,
                                          dtype=kv_dtype, quant=quant)
    return build_lookup_decoder(apply_fn, factory, gamma=gamma,
                                ngram=ngram, eos_id=eos_id,
                                max_length=target_cfg.max_length)


def speculative_decode(target_model, target_cfg, target_params,
                       draft_model, draft_cfg, draft_params,
                       prompts, *, max_new_tokens: int = 64,
                       gamma: int = 4, temperature: float = 0.0,
                       eos_id: int = -1, seed: int = 0):
    """One-call batch API: right-pads `prompts` (list of id lists),
    jits the decoder, returns (list of generated-token lists,
    SpecResult)."""
    plen = np.asarray([len(p) for p in prompts], np.int32)
    Lp = max(int(plen.max()), 1)
    buf = np.zeros((len(prompts), Lp), np.int32)
    for i, p in enumerate(prompts):
        buf[i, :len(p)] = p
    decode = elm_spec_decoder(target_model, target_cfg, draft_model,
                              draft_cfg, gamma=gamma,
                              temperature=temperature, eos_id=eos_id)
    fn = jax.jit(partial(decode, max_new=max_new_tokens))
    seeds = np.arange(seed, seed + len(prompts), dtype=np.int32)
    res = fn(target_params, draft_params, jnp.asarray(buf),
             jnp.asarray(plen), jnp.asarray(seeds))
    toks = np.asarray(res.tokens)
    em = np.asarray(res.emitted)
    outs = [toks[i, plen[i]:plen[i] + em[i]].tolist()
            for i in range(len(prompts))]
    return outs, res
