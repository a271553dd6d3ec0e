"""AR continuous batching: a persistent on-device decode batch that
requests join and leave without restarting decode.

The reference serves AR generation one fixed batch per request
(reference: demo/server.py:117-219 queues whole requests to per-GPU
workers); this is the vLLM-style generalization built TPU-native:

  * ALL decode state lives on device — tokens (S, L), per-layer KV cache
    (n_blocks, S, L, H, D), per-row positions / activity / stop bounds /
    temperatures — and every mutation is a jitted program with donated
    buffers (no reallocation, no host round-trip per token).
  * Rows advance at PER-ROW cache positions: the DIT's cached path accepts
    a (B,) cache_index vector (models/dit.py Attention), so a row that
    joined late decodes its 3rd token while its neighbor decodes its 400th
    — one model call serves both.
  * Admission is one jitted `insert`: the prompt prefills its K/V in a
    single multi-token causal pass (bucketed lengths, so only a few shapes
    ever compile), the first token is sampled from the last prompt logit,
    and the row is spliced into the live state.
  * Decode advances `chunk` tokens per dispatch via `lax.scan` — the host
    only looks at (pos, active, x) between chunks to emit stream deltas
    and retire finished rows.

Finished rows simply deactivate: their slots are reused by the next
admission, and stale K/V above the new prompt is never attended because
the causal mask only exposes keys <= the row's own position.
"""

from __future__ import annotations

import queue
import threading
import time as _time
from concurrent.futures import Future
from functools import partial
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.subs import NEG_INFINITY, restrict_modality_logits
from unidisc_tpu.sampling.ar_sampler import init_kv_cache_for


class DecodeState(NamedTuple):
    """Device-resident continuous-batching state (S slots, length L)."""
    x: jax.Array        # (S, L) int32 — prompt + generated tokens
    mod: jax.Array      # (S, L) int32 — per-position modality
    kv: tuple           # per-layer cache stack: (k, v) each
    #                      (n_blocks, S, L, H, D) bf16, or the int8
    #                      4-tuple (k_q, k_s, v_q, v_s) when
    #                      model.kv_cache_dtype == "int8"
    pos: jax.Array      # (S,) int32 — next KV write position; x[s, pos[s]]
    #                      is the latest token whose K/V is not yet written
    active: jax.Array   # (S,) bool
    stop: jax.Array     # (S,) int32 — absolute position bound (plen+max_new)
    temp: jax.Array     # (S,) float32 — per-row temperature (<=0 -> greedy)
    seed: jax.Array     # (S,) int32 — per-row sampling seed; the Gumbel
    #                      draw for the token written at position p is a
    #                      pure function of (seed, p), so a seeded request
    #                      reproduces exactly regardless of what else
    #                      shares the batch or when it was admitted
    dkv: tuple = ()     # draft model's KV cache when speculative rounds
    #                      are enabled (build_continuous_decoder draft=);
    #                      () otherwise


def _sample_row(logits, temp, g):
    """Per-row temperature Gumbel-argmax; temp<=0 decodes greedy."""
    greedy = jnp.argmax(logits, axis=-1)
    t = jnp.maximum(temp, 1e-6)[:, None]
    noisy = jnp.argmax(logits / t + g, axis=-1)
    return jnp.where(temp > 0, noisy, greedy)


def _row_gumbel(seeds, positions, vocab):
    """(k,) seeds + (k,) write positions -> (k, vocab) Gumbel noise,
    row i drawn from fold_in(PRNGKey(seed_i), pos_i)."""
    def one(seed, pos):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), pos)
        return jax.random.gumbel(k, (vocab,), jnp.float32)
    return jax.vmap(one)(seeds, positions)


def build_continuous_decoder(model, config: Optional[Config], *,
                             slots: int = 8, chunk: int = 8,
                             eos_id: int = -1, apply_fn=None,
                             cache_factory=None, restrict_fn=None,
                             length: Optional[int] = None,
                             cache_batch_axis: int = 1,
                             draft=None, gamma: int = 4,
                             lookup_ngram: Optional[int] = None):
    """Build the jitted state machine for continuous AR decoding.

    Returns (init_state, make_insert, decode_chunk, make_insert_many):
      init_state() -> DecodeState of `slots` empty rows.
      make_insert(bucket) -> jitted insert(params, state, slot, prompt,
        mod_row, prompt_len, max_new, temperature, seed) -> DecodeState.
        `prompt` is (bucket,) padded; one compile per bucket length.
      decode_chunk(params, state) -> DecodeState advanced by `chunk`
        tokens on every active row (inactive rows are untouched);
        sampling noise is a pure function of each row's (seed, position).

    Default closures serve a causal DIT; other AR models plug in via
    apply_fn(params, tok, mod_tok, kv, cache_index) -> (logits, kv),
    cache_factory(batch, L) -> kv pytree, restrict_fn(logits, mod_next)
    -> logits, and an explicit `length` (see elm_continuous_batcher).

    draft=(draft_apply_fn, draft_cache_factory): SPECULATIVE rounds —
    each decode advance runs draft-verify rounds (serving/speculative.py
    semantics) instead of single-token steps: the draft proposes `gamma`
    tokens per round, the target verifies them in one chunked forward,
    and each row advances by its own accepted count. Params for every
    jitted call become the tuple (target_params, draft_params). Greedy
    rows (temp<=0) stay LOSSLESS vs plain decoding; stochastic rows use
    rejection sampling with the residual correction (noise is a pure
    function of (seed, position, stream-tag), so results remain
    independent of co-tenancy, but differ from the non-speculative
    noise law)."""
    if config is not None:
        m = config.model
        L = length or m.length
        assert not m.full_attention, \
            "continuous batching needs a causal model"
    else:
        m = None
        assert length is not None and apply_fn is not None \
            and cache_factory is not None and restrict_fn is not None
        L = length

    if apply_fn is None:
        def apply_fn(params, tok, mod_tok, kv, cache_index):
            sigma = jnp.zeros((tok.shape[0],), jnp.float32)
            return model.apply({"params": params}, tok, sigma,
                               modality=mod_tok, kv_cache=kv,
                               cache_index=cache_index)
    if cache_factory is None:
        def cache_factory(batch, L):
            return init_kv_cache_for(m, batch, L)

    assert draft is None or lookup_ngram is None, \
        "draft-model and prompt-lookup speculation are exclusive"
    if draft is not None:
        draft_apply, draft_cache_factory = draft
        tparams = lambda params: params[0]
        dparams = lambda params: params[1]
        # spec rounds write a (gamma+1) window at pos+1: cap stop so an
        # ACTIVE row's window always fits the buffer without shifting
        stop_cap = L - (gamma + 1)
    else:
        tparams = lambda params: params
        dparams = None
        # lookup rounds write the same (gamma+1) window
        stop_cap = L - (gamma + 1) if lookup_ngram else L

    def init_state() -> DecodeState:
        kv = cache_factory(slots, L)
        return DecodeState(
            x=jnp.zeros((slots, L), jnp.int32),
            mod=jnp.zeros((slots, L), jnp.int32),
            kv=kv,
            pos=jnp.zeros((slots,), jnp.int32),
            active=jnp.zeros((slots,), bool),
            stop=jnp.zeros((slots,), jnp.int32),
            temp=jnp.ones((slots,), jnp.float32),
            seed=jnp.zeros((slots,), jnp.int32),
            dkv=(draft_cache_factory(slots, L)
                 if draft is not None else ()))

    if restrict_fn is not None:
        _restrict = restrict_fn
    else:
        def _restrict(logits, mod_next):
            ids = jnp.arange(logits.shape[-1])
            logits = logits + jnp.where(ids == m.mask_index,
                                        NEG_INFINITY, 0.0)
            if m.force_argmax_valid_indices:
                logits = restrict_modality_logits(logits, mod_next,
                                                  m.text_vocab_size)
            return logits

    def _insert(params, state: DecodeState, slot, prompt, mod_row,
                prompt_len, max_new, temperature, seed) -> DecodeState:
        bucket = prompt.shape[0]
        # multi-token causal prefill: one pass writes K/V for positions
        # [0, bucket); garbage beyond prompt_len is never attended (the
        # causal mask exposes keys <= pos only) and is overwritten as the
        # row decodes forward
        kv1 = cache_factory(1, L)
        mod_prompt = jax.lax.dynamic_slice_in_dim(mod_row, 0, bucket)
        logits, kv1_new = apply_fn(tparams(params), prompt[None],
                                   mod_prompt[None], kv1, 0)
        last = logits[0, prompt_len - 1].astype(jnp.float32)
        write0 = jnp.minimum(prompt_len, L - 1)
        mod_next = jax.lax.dynamic_index_in_dim(
            mod_row, write0, keepdims=False)
        last = _restrict(last[None], mod_next[None])
        seed_v = jnp.asarray([seed], jnp.int32)
        g = _row_gumbel(seed_v, write0[None], last.shape[-1])
        tok0 = _sample_row(last, jnp.asarray([temperature], jnp.float32),
                           g)[0].astype(jnp.int32)

        x_row = jnp.zeros((L,), jnp.int32)
        x_row = jax.lax.dynamic_update_slice(x_row, prompt, (0,))
        x_row = x_row.at[write0].set(tok0)

        upd = lambda a, r: jax.lax.dynamic_update_slice_in_dim(
            a, r[None].astype(a.dtype), slot, axis=0)

        def splice(cache, row):
            # the cache's batch axis differs per model family (DIT
            # stacked: 1; ELM per-layer: 0)
            starts = [0] * cache.ndim
            starts[cache_batch_axis] = slot
            return jax.lax.dynamic_update_slice(
                cache, row.astype(cache.dtype), tuple(starts))
        kv = jax.tree_util.tree_map(splice, state.kv, kv1_new)
        dkv = state.dkv
        if draft is not None:
            _, dkv1_new = draft_apply(dparams(params), prompt[None],
                                      mod_prompt[None],
                                      draft_cache_factory(1, L), 0)
            dkv = jax.tree_util.tree_map(splice, state.dkv, dkv1_new)
        # a row is born done when tok0 is EOS or it cannot advance past
        # tok0 (covers max_new<=1 AND prompts at/past the spec-mode
        # stop_cap, whose stop lands at or below pos — such a row must
        # never be active or the spec window write would clamp below
        # pos+1 and clobber committed tokens)
        stop_v = jnp.minimum(prompt_len + max_new, stop_cap)
        started_done = (tok0 == eos_id) | (prompt_len + 1 >= stop_v)
        return DecodeState(
            x=upd(state.x, x_row),
            mod=upd(state.mod, mod_row),
            kv=kv,
            pos=state.pos.at[slot].set(prompt_len),
            active=state.active.at[slot].set(~started_done),
            stop=state.stop.at[slot].set(stop_v),
            temp=state.temp.at[slot].set(temperature),
            seed=state.seed.at[slot].set(seed),
            dkv=dkv)

    def _insert_many(params, state: DecodeState, slots_v, prompts,
                     mod_rows, plens, max_news, temps, seeds
                     ) -> DecodeState:
        """Admit a GROUP of prompts in one program: batched prefill +
        scatter into the state. One device dispatch per admission round
        instead of one per request — on high-latency links (tunneled
        chips: ~130ms/RPC) dispatch count dominates serving cost.

        Padding rows duplicate row 0's slot AND payload, so the
        duplicate scatter indices write identical values (order-safe).
        """
        k, bucket = prompts.shape
        kvk = cache_factory(k, L)
        logits, kv_new = apply_fn(tparams(params), prompts,
                                  mod_rows[:, :bucket], kvk, 0)
        last = jnp.take_along_axis(
            logits, (plens - 1)[:, None, None], axis=1)[:, 0]
        nxt = jnp.minimum(plens, L - 1)
        mod_next = jnp.take_along_axis(mod_rows, nxt[:, None], 1)[:, 0]
        last = _restrict(last.astype(jnp.float32), mod_next)
        g = _row_gumbel(seeds, nxt, last.shape[-1])
        tok0 = _sample_row(last, temps, g).astype(jnp.int32)     # (k,)

        x_rows = jnp.zeros((k, L), jnp.int32).at[:, :bucket].set(prompts)
        x_rows = jnp.where(jnp.arange(L)[None, :] == nxt[:, None],
                           tok0[:, None], x_rows)
        def scatter(cache, rows):
            idx = (slice(None),) * cache_batch_axis + (slots_v,)
            return cache.at[idx].set(rows.astype(cache.dtype))
        kv = jax.tree_util.tree_map(scatter, state.kv, kv_new)
        dkv = state.dkv
        if draft is not None:
            _, dkv_new = draft_apply(dparams(params), prompts,
                                     mod_rows[:, :bucket],
                                     draft_cache_factory(k, L), 0)
            dkv = jax.tree_util.tree_map(scatter, state.dkv, dkv_new)
        # same born-done rule as _insert (EOS, max_new<=1, or a stop_cap
        # clamp leaving no headroom beyond tok0)
        stop_v = jnp.minimum(plens + max_news, stop_cap)
        started_done = (tok0 == eos_id) | (plens + 1 >= stop_v)
        return DecodeState(
            x=state.x.at[slots_v].set(x_rows),
            mod=state.mod.at[slots_v].set(mod_rows),
            kv=kv,
            pos=state.pos.at[slots_v].set(plens),
            active=state.active.at[slots_v].set(~started_done),
            stop=state.stop.at[slots_v].set(stop_v),
            temp=state.temp.at[slots_v].set(temps),
            seed=state.seed.at[slots_v].set(seeds),
            dkv=dkv)

    _insert_cache = {}

    def make_insert(bucket: int):
        if bucket not in _insert_cache:
            _insert_cache[bucket] = jax.jit(_insert, donate_argnums=(1,))
        return _insert_cache[bucket]

    _insert_many_cache = {}

    def make_insert_many(bucket: int):
        if bucket not in _insert_many_cache:
            _insert_many_cache[bucket] = jax.jit(_insert_many,
                                                 donate_argnums=(1,))
        return _insert_many_cache[bucket]

    def _insert_prefix(params, state: DecodeState, slot, src_slot,
                       prompt_full, suffix, mod_row, mod_sfx,
                       prompt_len, shared, max_new, temperature,
                       seed) -> DecodeState:
        """Admit with PREFIX REUSE (automatic prefix caching): positions
        [0, shared) of this prompt are already resident in `src_slot`'s
        KV (that slot was prefilled with a prompt sharing the prefix and
        has not been reused since) — copy the donor's whole KV row and
        prefill only `suffix` = prompt[shared:] at cache_index=shared,
        attending the copied prefix keys. The copy is the FULL row
        (static shapes); donor positions beyond `shared` are stale junk
        covered by the standard invariant: every position >= shared is
        rewritten (suffix prefill, then decode) before any query can
        attend it. Output tokens are bit-identical to a full prefill —
        only the prefill FLOPs change."""

        def take_row(cache):
            starts = [0] * cache.ndim
            starts[cache_batch_axis] = src_slot
            sizes = list(cache.shape)
            sizes[cache_batch_axis] = 1
            return jax.lax.dynamic_slice(cache, tuple(starts),
                                         tuple(sizes))

        def splice(cache, row):
            starts = [0] * cache.ndim
            starts[cache_batch_axis] = slot
            return jax.lax.dynamic_update_slice(
                cache, row.astype(cache.dtype), tuple(starts))

        kv_row = jax.tree_util.tree_map(take_row, state.kv)
        # mod_sfx is sliced on the HOST (mod_row[shared:shared+bucket_s]
        # padded) — an in-program dynamic_slice would clamp its start
        # when shared+bucket_s > L and misalign the suffix modality
        ci = jnp.full((1,), shared, jnp.int32)
        logits, kv_row = apply_fn(tparams(params), suffix[None],
                                  mod_sfx[None], kv_row, ci)
        # host guarantees shared <= prompt_len - 1, so the suffix is
        # non-empty and its last position yields tok0's logits
        last = jnp.take_along_axis(
            logits, (prompt_len - shared - 1)[None, None, None],
            axis=1)[0, 0].astype(jnp.float32)
        write0 = jnp.minimum(prompt_len, L - 1)
        mod_next = jax.lax.dynamic_index_in_dim(mod_row, write0,
                                                keepdims=False)
        last = _restrict(last[None], mod_next[None])
        seed_v = jnp.asarray([seed], jnp.int32)
        g = _row_gumbel(seed_v, write0[None], last.shape[-1])
        tok0 = _sample_row(last, jnp.asarray([temperature], jnp.float32),
                           g)[0].astype(jnp.int32)

        x_row = jnp.zeros((L,), jnp.int32)
        x_row = jax.lax.dynamic_update_slice(x_row, prompt_full, (0,))
        x_row = x_row.at[write0].set(tok0)

        upd = lambda a, r: jax.lax.dynamic_update_slice_in_dim(
            a, r[None].astype(a.dtype), slot, axis=0)
        kv = jax.tree_util.tree_map(splice, state.kv, kv_row)
        dkv = state.dkv
        if draft is not None:
            dkv_row = jax.tree_util.tree_map(take_row, state.dkv)
            _, dkv_row = draft_apply(dparams(params), suffix[None],
                                     mod_sfx[None], dkv_row, ci)
            dkv = jax.tree_util.tree_map(splice, state.dkv, dkv_row)
        stop_v = jnp.minimum(prompt_len + max_new, stop_cap)
        started_done = (tok0 == eos_id) | (prompt_len + 1 >= stop_v)
        return DecodeState(
            x=upd(state.x, x_row),
            mod=upd(state.mod, mod_row),
            kv=kv,
            pos=state.pos.at[slot].set(prompt_len),
            active=state.active.at[slot].set(~started_done),
            stop=state.stop.at[slot].set(stop_v),
            temp=state.temp.at[slot].set(temperature),
            seed=state.seed.at[slot].set(seed),
            dkv=dkv)

    _insert_prefix_cache = {}

    def make_insert_prefix(bucket_full: int, bucket_suffix: int):
        key = (bucket_full, bucket_suffix)
        if key not in _insert_prefix_cache:
            _insert_prefix_cache[key] = jax.jit(_insert_prefix,
                                                donate_argnums=(1,))
        return _insert_prefix_cache[key]

    def _step(params, state: DecodeState) -> DecodeState:
        x, mod, pos, active = state.x, state.mod, state.pos, state.active
        tok = jnp.take_along_axis(x, pos[:, None], axis=1)       # (S, 1)
        mod_tok = jnp.take_along_axis(mod, pos[:, None], axis=1)
        logits, kv = apply_fn(tparams(params), tok, mod_tok, state.kv, pos)
        logits = logits[:, 0].astype(jnp.float32)                # (S, V)

        nxt = jnp.minimum(pos + 1, L - 1)
        mod_next = jnp.take_along_axis(mod, nxt[:, None], axis=1)[:, 0]
        logits = _restrict(logits, mod_next)
        # noise is a pure function of (row seed, write position): a seeded
        # request's token stream is independent of batch composition
        g = _row_gumbel(state.seed, nxt, logits.shape[-1])
        tok_new = _sample_row(logits, state.temp, g).astype(jnp.int32)

        x_written = jax.vmap(
            lambda row, t, p: jax.lax.dynamic_update_slice(row, t[None], (p,))
        )(x, tok_new, nxt)
        x = jnp.where(active[:, None], x_written, x)
        pos = jnp.where(active, nxt, pos)
        hit_eos = active & (tok_new == eos_id)
        exhausted = nxt + 1 >= state.stop
        active = active & ~hit_eos & ~exhausted
        return state._replace(x=x, kv=kv, pos=pos, active=active)

    # -- speculative round (draft-verify) -------------------------------
    # The accept/correct math and the RNG law are IMPORTED from
    # serving/speculative.py (spec_key / accept_window) — single source
    # of the losslessness guarantee; this wrapper only adds per-row
    # temperatures, modality restriction, and the batcher's stop bounds.

    from unidisc_tpu.serving.speculative import accept_window, spec_key

    def _sample_rows(state, logits, positions, tag):
        """Per-row temp Gumbel-argmax with (seed, position, tag) noise;
        greedy rows (temp<=0) take the plain argmax."""
        def one(lg, seed, p, t):
            g = jax.random.gumbel(spec_key(seed, p, tag),
                                  lg.shape, jnp.float32)
            noisy = jnp.argmax(lg / jnp.maximum(t, 1e-6) + g, -1)
            return jnp.where(t > 0, noisy, jnp.argmax(lg, -1))
        return jax.vmap(one)(logits, state.seed, positions,
                             state.temp).astype(jnp.int32)

    def _spec_round(params, state: DecodeState) -> DecodeState:
        x, mod, pos = state.x, state.mod, state.pos
        cur = jnp.take_along_axis(x, pos[:, None], 1)[:, 0]
        inv_t = 1.0 / jnp.maximum(state.temp, 1e-6)
        sample_rows = partial(_sample_rows, state)

        # draft phase: gamma+1 single-token steps (the +1 keeps the
        # draft cache hole-free at the bonus position)
        def dstep(carry, i):
            dkv, tok = carry
            p_i = jnp.minimum(pos + i, L - 1)
            mod_tok = jnp.take_along_axis(mod, p_i[:, None], 1)
            lg, dkv = draft_apply(dparams(params), tok[:, None],
                                  mod_tok, dkv, p_i)
            lg = lg[:, 0].astype(jnp.float32)
            nx = jnp.minimum(pos + i + 1, L - 1)
            mod_nx = jnp.take_along_axis(mod, nx[:, None], 1)[:, 0]
            lg = _restrict(lg, mod_nx)
            nxt_tok = sample_rows(lg, nx, 1)
            lp = jax.nn.log_softmax(lg * inv_t[:, None], -1)
            return (dkv, nxt_tok), (nxt_tok, lp)

        (dkv, _), (drafted, lp_d) = jax.lax.scan(
            dstep, (state.dkv, cur), jnp.arange(gamma + 1))
        drafted = drafted.T[:, :gamma]               # (S, gamma)
        lp_d = jnp.swapaxes(lp_d, 0, 1)[:, :gamma]   # (S, gamma, V)
        return _verify_and_advance(params, state, drafted, lp_d, dkv)

    def _lookup_round(params, state: DecodeState) -> DecodeState:
        """Draft-FREE spec round: proposals from lookup_proposals
        (n-gram self-continuation over the row's committed buffer —
        serving/speculative.py). Draft log-probs are the delta
        distribution at the proposal (one-hot, log 1 = 0), under which
        the shared rejection rule reduces to: accept with prob
        p_t(proposal), residual = renormalize(p_t minus the proposal's
        mass) — exact for stochastic rows, exact-match for greedy."""
        from unidisc_tpu.serving.speculative import lookup_proposals
        drafted, _found = lookup_proposals(state.x, state.pos,
                                           gamma=gamma,
                                           ngram=lookup_ngram)
        return _verify_and_advance(params, state, drafted, None,
                                   state.dkv)

    def _verify_and_advance(params, state: DecodeState, drafted, lp_d,
                            dkv) -> DecodeState:
        x, mod, pos, active = state.x, state.mod, state.pos, state.active
        S = x.shape[0]
        cur = jnp.take_along_axis(x, pos[:, None], 1)[:, 0]
        inv_t = 1.0 / jnp.maximum(state.temp, 1e-6)
        sample_rows = partial(_sample_rows, state)

        # verify: one target forward over [cur, d_1..d_gamma]
        chunk_tok = jnp.concatenate([cur[:, None], drafted], 1)
        p_mat = jnp.minimum(pos[:, None] + jnp.arange(gamma + 1)[None, :],
                            L - 1)
        mod_chunk = jnp.take_along_axis(mod, p_mat, 1)
        lg_t, kv = apply_fn(tparams(params), chunk_tok, mod_chunk,
                            state.kv, pos)
        lg_t = lg_t.astype(jnp.float32)              # (S, gamma+1, V)
        V = lg_t.shape[-1]
        nxt_mat = jnp.minimum(p_mat + 1, L - 1)
        mod_nxt = jnp.take_along_axis(mod, nxt_mat, 1)
        lg_t = _restrict(lg_t.reshape(-1, V),
                         mod_nxt.reshape(-1)).reshape(S, gamma + 1, V)
        lp_t = jax.nn.log_softmax(lg_t * inv_t[:, None, None], -1)
        if lp_d is None:
            # lookup mode: delta-distribution draft (log 1 = 0 at the
            # proposal, -inf elsewhere) — see _lookup_round
            lp_d = jnp.where(
                jax.nn.one_hot(drafted, V, dtype=bool), 0.0, -1e30)

        # accept/correct via the shared Leviathan core: per-row stoch
        # flag (temp>0); noise tags 2/3/4 match speculative.py's law
        u = jax.vmap(jax.vmap(
            lambda seed, p: jax.random.uniform(
                spec_key(seed, p, 2), (), jnp.float32, minval=1e-20),
            in_axes=(None, 0)), in_axes=(0, 0))(state.seed,
                                                nxt_mat[:, :gamma])
        g_corr = jax.vmap(jax.vmap(
            lambda seed, p: jax.random.gumbel(
                spec_key(seed, p, 3), (lp_t.shape[-1],), jnp.float32),
            in_axes=(None, 0)), in_axes=(0, 0))(state.seed,
                                                nxt_mat[:, :gamma])
        bonus = sample_rows(lg_t[:, gamma], nxt_mat[:, gamma], 4)
        win, n = accept_window(drafted, lp_d, lg_t, lp_t,
                               stoch=state.temp > 0, u=u, g_corr=g_corr,
                               bonus=bonus)
        idx = jnp.arange(gamma + 1)[None, :]

        # advance: accepted+1, cut by the stop bound and the first EOS
        adv = jnp.minimum(n + 1, jnp.maximum(state.stop - 1 - pos, 0))
        if eos_id >= 0:
            real = idx <= n[:, None]
            is_eos = (win == eos_id) & real
            any_eos = is_eos.any(-1)
            adv = jnp.where(any_eos,
                            jnp.minimum(adv, jnp.argmax(is_eos, -1) + 1),
                            adv)
        adv = jnp.where(active, adv, 0)

        # write the window at pos+1 (junk beyond adv is rewritten before
        # any read — see serving/speculative.py); inactive rows AND rows
        # that cannot advance keep x — an adv==0 row's start would clamp
        # below pos+1 and clobber committed tokens (insert also
        # deactivates such rows; this gate keeps the invariant local)
        start = jnp.minimum(pos + 1, L - (gamma + 1))
        cur_win = jax.vmap(lambda row, p: jax.lax.dynamic_slice(
            row, (p,), (gamma + 1,)))(x, start)
        keep = jnp.where((active & (adv > 0))[:, None], win, cur_win)
        x = jax.vmap(lambda row, w, p: jax.lax.dynamic_update_slice(
            row, w, (p,)))(x, keep, start)

        new_pos = pos + adv
        last = jnp.take_along_axis(
            win, jnp.clip(adv - 1, 0, gamma)[:, None], 1)[:, 0]
        hit_eos = active & (adv > 0) & (last == eos_id) \
            if eos_id >= 0 else jnp.zeros_like(active)
        exhausted = new_pos + 1 >= state.stop
        new_active = active & ~hit_eos & ~exhausted
        return state._replace(x=x, kv=kv, dkv=dkv, pos=new_pos,
                              active=new_active)

    if draft is not None or lookup_ngram:
        rounds = max(1, -(-chunk // (gamma + 1)))
        _round = _spec_round if draft is not None else _lookup_round

        def _decode_chunk(params, state: DecodeState) -> DecodeState:
            def body(s, _):
                return _round(params, s), None
            state, _ = jax.lax.scan(body, state, None, length=rounds)
            return state
    else:
        def _decode_chunk(params, state: DecodeState) -> DecodeState:
            def body(s, _):
                return _step(params, s), None
            state, _ = jax.lax.scan(body, state, None, length=chunk)
            return state

    decode_chunk = jax.jit(_decode_chunk, donate_argnums=(1,))
    return (init_state, make_insert, decode_chunk, make_insert_many,
            make_insert_prefix)


def _bucket(n: int, lo: int = 32) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class ContinuousBatcher:
    """Thread-safe front end: submit() returns a Future; a worker thread
    admits pending requests into free slots and advances the device batch.

    `device_lock` (e.g. InferenceEngine._device_lock) serializes device
    use against other samplers sharing the chip.
    """

    def __init__(self, model, params, config: Optional[Config], *,
                 slots: int = 8, chunk: int = 8, eos_id: int = -1,
                 device_lock: Optional[threading.Lock] = None,
                 drain_deadline_s: float = 0.05,
                 prefix_min: int = 16,
                 **decoder_kwargs):
        self.config = config
        self.params = params
        self.slots = slots
        self.chunk = chunk
        self.eos_id = eos_id
        # max tokens one decode dispatch can advance a row: `chunk`
        # single-token steps, or ceil(chunk/(gamma+1)) spec rounds of up
        # to gamma+1 tokens each (the host pos estimate must be an UPPER
        # bound for finish detection)
        self.length = decoder_kwargs.get("length") or config.model.length
        if decoder_kwargs.get("draft") is not None \
                or decoder_kwargs.get("lookup_ngram"):
            g = decoder_kwargs.get("gamma", 4)
            self._max_advance = -(-chunk // (g + 1)) * (g + 1)
            # the device caps stop at L-(gamma+1) so an active row's
            # verify window always fits the buffer; the host estimate
            # must use the SAME bound or rows that finish at the cap
            # keep dispatching dead decode chunks (and their retiring
            # drain is delayed)
            self._stop_cap = self.length - (g + 1)
        else:
            self._max_advance = chunk
            self._stop_cap = self.length
        self.drain_deadline_s = drain_deadline_s
        self._chunk_s = None      # EMA of one decode chunk's wall time
        self._last_drain = _time.monotonic()
        self._lock = device_lock or threading.Lock()
        (self._init_state, self._make_insert, self._decode,
         self._make_insert_many, self._make_insert_prefix) = \
            build_continuous_decoder(model, config, slots=slots,
                                     chunk=chunk, eos_id=eos_id,
                                     **decoder_kwargs)
        self.state = self._init_state()
        self._queue: "queue.Queue" = queue.Queue()
        self._slot_req: list = [None] * slots
        # automatic prefix caching: per-slot record of the prompt whose
        # prefill KV is resident there (valid until the slot is reused —
        # decode only writes positions >= prompt_len). prefix_min is the
        # shortest shared prefix worth a KV-row copy; 0 disables.
        self._prefix_min = prefix_min
        self._slot_prompt: list = [None] * slots
        self.prefix_hits = 0
        self._seq = 0
        self._stopping = False
        self._worker_thread = threading.Thread(target=self._worker,
                                               daemon=True)
        self._worker_thread.start()

    def submit(self, prompt_ids: Sequence[int], *, max_new_tokens: int = 64,
               temperature: float = 0.0, seed: Optional[int] = None,
               modality: Optional[Sequence[int]] = None,
               stream_cb: Optional[Callable] = None) -> Future:
        """Queue a decode request. The Future resolves to a dict with
        'tokens' (generated ids, EOS stripped) and 'prompt_len'."""
        fut: Future = Future()
        self._queue.put(dict(prompt=np.asarray(prompt_ids, np.int32),
                             modality=(None if modality is None else
                                       np.asarray(modality, np.int32)),
                             max_new=int(max_new_tokens),
                             temperature=float(temperature), seed=seed,
                             stream_cb=stream_cb, future=fut, emitted=0))
        return fut

    def shutdown(self):
        self._stopping = True
        self._worker_thread.join(timeout=30)

    # -- worker internals --------------------------------------------------

    def _admit_group(self, pairs):
        """Admit [(req, slot)] in ONE jitted call (batched prefill +
        scatter — _insert_many). Padding rows replicate entry 0, whose
        duplicate scatter writes are value-identical and therefore
        order-safe. Each row carries its own sampling seed (client's, or
        a fresh counter value): sampling noise is a pure function of
        (seed, position), so a seeded request reproduces exactly even
        when admitted in a group under concurrent load.
        """
        L = self.length
        valid = []
        for req, slot in pairs:
            plen = len(req["prompt"])
            if plen >= L - 1:
                req["future"].set_exception(ValueError(
                    f"prompt length {plen} >= model length {L}"))
                continue
            valid.append((req, slot, plen))
        if not valid:
            return
        k = len(valid)
        kmax = self.slots
        bucket = min(max(_bucket(p) for _, _, p in valid), L)
        prompts = np.zeros((kmax, bucket), np.int32)
        mods = np.zeros((kmax, L), np.int32)
        plens = np.zeros(kmax, np.int32)
        maxn = np.zeros(kmax, np.int32)
        temps = np.zeros(kmax, np.float32)
        slots_v = np.zeros(kmax, np.int32)
        seeds = np.zeros(kmax, np.int32)
        for i in range(kmax):
            req, slot, plen = valid[i] if i < k else valid[0]
            prompts[i, :plen] = req["prompt"]
            if req["modality"] is not None:
                n = min(len(req["modality"]), L)
                mods[i, :n] = req["modality"][:n]
            plens[i], maxn[i] = plen, req["max_new"]
            temps[i], slots_v[i] = req["temperature"], slot
            if req.get("seed") is None:
                self._seq += 1
                req["seed"] = self._seq
            seeds[i] = req["seed"]
        self.state = self._make_insert_many(bucket)(
            self.params, self.state, jnp.asarray(slots_v),
            jnp.asarray(prompts), jnp.asarray(mods), jnp.asarray(plens),
            jnp.asarray(maxn), jnp.asarray(temps), jnp.asarray(seeds))
        for req, slot, plen in valid:
            self._register_admission(req, slot, plen)

    def _register_admission(self, req, slot, plen):
        req["slot"] = slot
        req["prompt_len"] = plen
        # host-side position estimate: lets the worker SKIP drains
        # while no row can have hit its stop bound (each drain is a
        # full host round trip — ~100ms on a tunneled chip)
        req["pos_est"] = plen
        # mirror the device stop bound (incl. the spec-mode cap):
        # requests near the buffer end are truncated to the cap,
        # exactly as plain mode truncates at L
        req["stop_est"] = min(plen + req["max_new"], self._stop_cap)
        self._slot_req[slot] = req
        # the slot's resident prefill is now THIS prompt (prefix cache)
        self._slot_prompt[slot] = np.asarray(req["prompt"], np.int32)

    # -- automatic prefix caching ---------------------------------------

    def _find_prefix_donor(self, prompt) -> Optional[tuple]:
        """Longest usable shared prefix among slots whose prefill KV is
        still resident; returns (src_slot, shared) or None. Capped at
        len(prompt)-1 so the suffix prefill is never empty (tok0's
        logits come from its last position)."""
        if not self._prefix_min:
            return None
        p = np.asarray(prompt, np.int32)
        best, best_slot = 0, None
        for s, q in enumerate(self._slot_prompt):
            if q is None:
                continue
            m = min(len(q), len(p) - 1)
            if m < self._prefix_min or m <= best:
                continue
            neq = np.flatnonzero(q[:m] != p[:m])
            shared = int(neq[0]) if neq.size else m
            if shared >= self._prefix_min and shared > best:
                best, best_slot = shared, s
        return (best_slot, best) if best_slot is not None else None

    def _admit_prefix(self, req, slot, src_slot, shared):
        """Admit ONE request reusing `shared` prefix positions from
        `src_slot`'s resident KV (one KV-row copy + suffix-only
        prefill; tokens bit-identical to a full prefill)."""
        L = self.length
        plen = len(req["prompt"])
        if plen >= L - 1:
            req["future"].set_exception(ValueError(
                f"prompt length {plen} >= model length {L}"))
            return
        bucket_f = min(_bucket(plen), L)
        # the suffix chunk MUST fit the buffer: a write window past L
        # would make the model's dynamic_update_slice clamp its start
        # and overwrite the copied prefix KV
        bucket_s = min(_bucket(plen - shared), L - shared)
        prompt_full = np.zeros(bucket_f, np.int32)
        prompt_full[:plen] = req["prompt"]
        suffix = np.zeros(bucket_s, np.int32)
        suffix[:plen - shared] = req["prompt"][shared:]
        mod_row = np.zeros(L, np.int32)
        if req["modality"] is not None:
            n = min(len(req["modality"]), L)
            mod_row[:n] = req["modality"][:n]
        mod_sfx = np.zeros(bucket_s, np.int32)
        tail = mod_row[shared:shared + bucket_s]
        mod_sfx[:len(tail)] = tail
        if req.get("seed") is None:
            self._seq += 1
            req["seed"] = self._seq
        self.state = self._make_insert_prefix(bucket_f, bucket_s)(
            self.params, self.state, slot, src_slot,
            jnp.asarray(prompt_full), jnp.asarray(suffix),
            jnp.asarray(mod_row), jnp.asarray(mod_sfx),
            plen, shared, req["max_new"], req["temperature"],
            req["seed"])
        self.prefix_hits += 1
        self._register_admission(req, slot, plen)

    def _drain(self):
        """Emit deltas / retire finished rows from a host snapshot.

        ONE fused device_get — on a tunneled chip each host sync costs a
        full round trip (~100ms observed), so the snapshot must be a
        single transfer, not three."""
        pos, active, x = jax.device_get(
            (self.state.pos, self.state.active, self.state.x))
        self._last_drain = _time.monotonic()
        for slot, req in enumerate(self._slot_req):
            if req is None:
                continue
            req["pos_est"] = int(pos[slot])
            plen = req["prompt_len"]
            gen = x[slot, plen:pos[slot] + 1]
            if req["stream_cb"] is not None and len(gen) > req["emitted"]:
                req["stream_cb"](gen[req["emitted"]:].tolist())
                req["emitted"] = len(gen)
            if not active[slot]:
                toks = gen.tolist()
                if self.eos_id >= 0 and toks and toks[-1] == self.eos_id:
                    toks = toks[:-1]
                req["future"].set_result(
                    dict(tokens=toks, prompt_len=plen))
                self._slot_req[slot] = None

    def _worker(self):
        carry = None  # request popped while idle, kept FIFO-first
        while not self._stopping:
            admitted = False
            with self._lock:
                pairs = []
                free = [s for s in range(self.slots)
                        if self._slot_req[s] is None]
                if carry is not None and free:
                    pairs.append((carry, free.pop(0)))
                    carry = None
                for slot in free:
                    try:
                        req = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    pairs.append((req, slot))
                if pairs:
                    # prefix-cache hits admit individually FIRST (their
                    # donor slots may be overwritten by this round's
                    # group insert); the rest share one batched insert
                    group = []
                    for req, slot in pairs:
                        donor = self._find_prefix_donor(req["prompt"])
                        if donor is None:
                            group.append((req, slot))
                            continue
                        try:
                            self._admit_prefix(req, slot, *donor)
                            admitted = True
                        except Exception as e:  # noqa: BLE001
                            if not req["future"].done():
                                req["future"].set_exception(e)
                    try:
                        if group:
                            self._admit_group(group)
                            admitted = True
                    except Exception as e:  # fail the whole group
                        for req, _ in group:
                            if not req["future"].done():
                                req["future"].set_exception(e)
                live = [r for r in self._slot_req if r is not None]
                if live:
                    try:
                        t0 = _time.monotonic()
                        self.state = self._decode(self.params, self.state)
                        chunk_s = _time.monotonic() - t0
                        self._chunk_s = (chunk_s if self._chunk_s is None
                                         else 0.7 * self._chunk_s
                                         + 0.3 * chunk_s)
                        for r in live:
                            r["pos_est"] = min(
                                r["pos_est"] + self._max_advance,
                                r["stop_est"])
                        # drain (a full host round trip) only when it can
                        # matter: a stream is waiting, a row may have hit
                        # its stop bound, or — with EOS able to fire
                        # anytime — on a WALL-CLOCK deadline, so the
                        # latency added by drain skipping is bounded by
                        # max(one chunk's duration, drain_deadline_s)
                        # rather than a fixed chunk count (tighter when
                        # requests are queued for the freed slots)
                        must = any(r["stream_cb"] is not None
                                   for r in live) \
                            or any(r["pos_est"] + 1 >= r["stop_est"]
                                   for r in live)
                        deadline = max(self._chunk_s or 0.0,
                                       self.drain_deadline_s)
                        if not self._queue.empty():
                            deadline = min(deadline, 2 * (self._chunk_s
                                                          or 0.0))
                        if must or (self.eos_id >= 0
                                    and _time.monotonic()
                                    - self._last_drain >= deadline):
                            self._drain()
                    except Exception as e:  # device error (tunnel RPC
                        # failure, OOM): fail the live futures and reset
                        # the device state instead of silently killing
                        # the worker thread — the batcher stays usable
                        for slot, r in enumerate(self._slot_req):
                            if r is not None and not r["future"].done():
                                r["future"].set_exception(e)
                            self._slot_req[slot] = None
                        self.state = self._init_state()
                        self._last_drain = _time.monotonic()
                    continue
            if not admitted and carry is None:
                # idle: block briefly for the next arrival (held in
                # `carry` so FIFO order is preserved)
                try:
                    carry = self._queue.get(timeout=0.05)
                except queue.Empty:
                    pass


def elm_continuous_batcher(elm_model, params, elm_cfg, *, slots: int = 8,
                           chunk: int = 8, eos_id: int = -1,
                           length: Optional[int] = None,
                           quant_cache: bool = False,
                           draft=None, gamma: int = 4,
                           lookup_ngram: Optional[int] = None,
                           device_lock: Optional[threading.Lock] = None
                           ) -> "ContinuousBatcher":
    """Continuous batching for the OpenELM AR baseline (models/elm.py):
    the same persistent device batch, per-row positions, batched
    admission and drain-skipping, over ELM's per-layer GQA caches.
    quant_cache=True uses the int8 KV cache.

    draft=(draft_model, draft_cfg, draft_params): continuous SPECULATIVE
    serving — decode advances by draft-verify rounds of `gamma`
    proposals while admission/streaming/retirement work unchanged
    (greedy rows stay lossless; see build_continuous_decoder).

    lookup_ngram=N: DRAFT-FREE speculative serving (prompt lookup) —
    proposals come from each row's own n-gram history instead of a
    draft model; same lossless guarantee, zero extra weights."""
    from unidisc_tpu.models.elm import init_elm_cache

    L = length or elm_cfg.max_length

    def apply_fn(p, tok, mod_tok, kv, cache_index):
        return elm_model.apply({"params": p}, tok, kv_cache=kv,
                               cache_index=cache_index)

    def cache_factory(batch, length_):
        return init_elm_cache(elm_cfg, batch, length_, quant=quant_cache)

    draft_kw = {}
    if draft is not None:
        d_model, d_cfg, d_params = draft
        assert (d_cfg.vocab_size + d_cfg.extra_tokens
                == elm_cfg.vocab_size + elm_cfg.extra_tokens), \
            "speculative draft must share the target's vocabulary"

        def draft_apply(p, tok, mod_tok, kv, cache_index):
            return d_model.apply({"params": p}, tok, kv_cache=kv,
                                 cache_index=cache_index)

        def draft_cache_factory(batch, length_):
            return init_elm_cache(d_cfg, batch, length_)

        draft_kw = dict(draft=(draft_apply, draft_cache_factory),
                        gamma=gamma)
        params = (params, d_params)
    elif lookup_ngram:
        draft_kw = dict(lookup_ngram=lookup_ngram, gamma=gamma)

    return ContinuousBatcher(
        None, params, None, slots=slots, chunk=chunk, eos_id=eos_id,
        device_lock=device_lock, apply_fn=apply_fn,
        cache_factory=cache_factory, restrict_fn=lambda lg, mod: lg,
        length=L, cache_batch_axis=0, **draft_kw)
