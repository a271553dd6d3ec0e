"""Specialized text->image sampler: span-factored vocab head.

For the headline t2i workload (text fully conditioned, image span
generated) the generic sampler wastes most of its vocab-dimension work:
logits for text positions are computed every step and immediately clamped,
and image positions only ever sample from the image-vocab slice
(force_argmax_valid_indices). This sampler (SURVEY hard part #5 — "fuse
per-modality logit masking into the final-layer computation"):

  * runs the DIT trunk with `return_hidden=True`
  * applies the final layer (norm + adaLN modulation + linear) ONLY over
    the image span and ONLY against the image-vocab slice of the head
    kernel — (B, img_len, img_vocab) instead of (B, L, total_vocab),
    4.4x fewer logit elements for the production 384/48385 layout
  * maskgit confidence updates on the image span alone

Exactness: the factored head is checked against the full forward's logits
slice in tests (same params, same math, sliced matmul).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from unidisc_tpu.config import Config
from unidisc_tpu.diffusion.noise import get_noise
from unidisc_tpu.sampling.sampler import (SampleResult, adaptive_schedule,
                                          confidence_threshold,
                                          guidance_weight)


def _head_pre(params, hidden_img, c, cfg, compute_dtype=jnp.bfloat16):
    """Norm + adaLN modulate of DDitFinalLayer (everything before the
    linear) — BITWISE mirror of models/dit.py (weight-only fp32 norm
    rounded back to compute dtype, bf16 modulate)."""
    out = params["output_layer"]
    w = out["norm_final"]["weight"]
    x32 = hidden_img.astype(jnp.float32)
    if cfg.model.norm_type == "rms":
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 ** 2, -1, keepdims=True) + 1e-6)
    else:
        mean = jnp.mean(x32, -1, keepdims=True)
        var = jnp.var(x32, -1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
    y = (y * w).astype(compute_dtype)  # Norm rounds to compute dtype
    if cfg.model.time_conditioning and "adaLN_modulation" in out:
        k = out["adaLN_modulation"]["kernel"].astype(compute_dtype)
        b = out["adaLN_modulation"]["bias"].astype(compute_dtype)
        cond = c.astype(compute_dtype) @ k + b
        shift, scale = jnp.split(cond[:, None, :], 2, axis=-1)
        y = y * (1 + scale) + shift  # image positions are always modulated
    return y


def _head_linear(params, y, cfg, v0):
    lin = params["output_layer"]["linear"]
    dt = jnp.bfloat16 if cfg.model.logits_dtype == "bfloat16" \
        else jnp.float32
    if "kernel_q" in lin:
        # int8 W8A8 head (ops/quant.py): slice the image-vocab columns of
        # the quantized kernel + its per-channel scales
        from unidisc_tpu.ops.quant import qdot
        return qdot(y, lin["kernel_q"][:, v0:], lin["scale"][v0:],
                    bias=lin["bias"][v0:], out_dtype=dt,
                    backend=getattr(cfg.model, "quant_backend", "xla"))
    kernel = lin["kernel"][:, v0:]
    bias = lin["bias"][v0:]
    return (y.astype(dt) @ kernel.astype(dt)) + bias.astype(dt)


def _img_head(params, hidden_img, c, cfg, v0,
              compute_dtype=jnp.bfloat16):
    """DDitFinalLayer over the image span x image-vocab slice."""
    return _head_linear(
        params, _head_pre(params, hidden_img, c, cfg, compute_dtype),
        cfg, v0)


def _sigma_cond(params, sigma, time_conditioning=True,
                compute_dtype=jnp.bfloat16):
    """Timestep conditioning vector c — bitwise mirror of DIT's
    TimestepEmbedder (fp32 mlp, rounded to compute dtype) + silu."""
    if not time_conditioning:
        return None
    import math
    sm = params["sigma_map"]
    half = 128
    freqs = jnp.exp(-math.log(10_000) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = sigma[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)
    h = emb @ sm["mlp_0"]["kernel"] + sm["mlp_0"]["bias"]
    h = jax.nn.silu(h)
    h = h @ sm["mlp_2"]["kernel"] + sm["mlp_2"]["bias"]
    return jax.nn.silu(h.astype(compute_dtype))


def img_log_weights_fn(model, config: Config) -> Callable:
    """(params, x (B, L), t (B,), modality) -> unnormalized image-span
    log-weights (B, Li, img_vocab) with CFG — the span-factored forward
    shared by the static t2i sampler and the rolling t2i batcher
    (serving/rolling.py). Per-row `t` is supported throughout
    (guidance_weight and the sigma embedding are (B,)-wise)."""
    cfg = config
    m = cfg.model
    s = cfg.sampling
    noise = get_noise(cfg.noise)
    Lt = m.txt_length
    v0 = m.text_vocab_size
    mask_index = m.mask_index
    use_cfg = s.cfg is not None

    def trunk(params, x, sigma, modality):
        logits, hidden = model.apply(
            {"params": params}, x, sigma, modality=modality,
            return_hidden=True)
        del logits  # head recomputed span-factored below
        return hidden

    def _cond_only(params, x, sigma, modality):
        hidden = trunk(params, x, sigma, modality)
        c = _sigma_cond(params, sigma, m.time_conditioning)
        return _img_head(params, hidden[:, Lt:], c, cfg, v0)

    def img_log_weights(params, x, t, modality):
        """The guidance weight honors the cfg_min/max_timestep windows
        (guidance_weight, reference model_eval.py:1737-1759); on steps
        where the window zeroes the whole batch's weight the
        unconditional trunk pass is skipped via lax.cond."""
        sigma = noise.total(t)
        if not use_cfg:
            return _cond_only(params, x, sigma, modality
                              ).astype(jnp.float32)
        wt = guidance_weight(s, t)  # (B,)

        def full(x):
            x_uncond = x.at[:, :Lt].set(mask_index)
            xx = jnp.concatenate([x, x_uncond], 0)
            ss = jnp.concatenate([sigma, sigma], 0)
            mm = jnp.concatenate([modality, modality], 0)
            hidden = trunk(params, xx, ss, mm)
            c = _sigma_cond(params, ss, m.time_conditioning)
            # the head's linear is LINEAR: combine the normalized+modulated
            # halves BEFORE the matmul — one (B, Li, V) head instead of two
            y = _head_pre(params, hidden[:, Lt:], c, cfg)
            yc, yu = jnp.split(y, 2, axis=0)
            w = wt[:, None, None].astype(y.dtype)
            return _head_linear(params, (1 + w) * yc - w * yu, cfg, v0)

        logits = jax.lax.cond(
            jnp.all(wt == 0.0),
            lambda x: _cond_only(params, x, sigma, modality), full, x)
        return logits.astype(jnp.float32)  # (B, Li, img_vocab)

    return img_log_weights


def img_log_weights_cached_fn(model, config: Config):
    """Conditioning-frozen variant of img_log_weights_fn: text rows are
    fixed conditioning in t2i, so their K/V are computed on cache-refresh
    steps only and every other step runs the trunk over the IMAGE rows
    alone against the cached text K/V (`cache_index=txt_length` writes the
    cache's image region; full attention reads the whole cache). Same
    approximation contract as sampling/caching.py recompute="img": frozen
    text representations go stale w.r.t. the evolving image between
    refreshes; with modality-gated modulation only image rows carry time
    conditioning, so there is no stale-sigma component. Under CFG the two
    halves' image rows are identical inputs — they differ only through
    attention to the cond vs re-masked text K/V in the cache.

    Returns (cache_full, cache_step), both
    (params, x (B, L), t (B,), modality, kv) -> (raw, kv) with raw the
    (B, Li, img_vocab) fp32 CFG-combined log-weights; cache_full rebuilds
    the cache from a full forward, cache_step costs img_length/L of it.
    """
    cfg = config
    m = cfg.model
    s = cfg.sampling
    noise = get_noise(cfg.noise)
    Lt, L = m.txt_length, m.length
    v0 = m.text_vocab_size
    mask_index = m.mask_index
    use_cfg = s.cfg is not None
    from unidisc_tpu.sampling.ar_sampler import init_kv_cache_for

    def _head(params, hidden_img, sigma_bb, t):
        c = _sigma_cond(params, sigma_bb, m.time_conditioning)
        y = _head_pre(params, hidden_img, c, cfg)
        if use_cfg:
            wt = guidance_weight(s, t)
            yc, yu = jnp.split(y, 2, axis=0)
            w = wt[:, None, None].astype(y.dtype)
            y = (1 + w) * yc - w * yu
        return _head_linear(params, y, cfg, v0).astype(jnp.float32)

    def cache_full(params, x, t, modality, kv):
        del kv  # rebuilt from scratch (same shapes/dtypes)
        sigma = noise.total(t)
        if use_cfg:
            x_uncond = x.at[:, :Lt].set(mask_index)
            xx = jnp.concatenate([x, x_uncond], 0)
            ss = jnp.concatenate([sigma, sigma], 0)
            mm = jnp.concatenate([modality, modality], 0)
        else:
            xx, ss, mm = x, sigma, modality
        kv = init_kv_cache_for(m, xx.shape[0], L)
        _, hidden, kv = model.apply({"params": params}, xx, ss,
                                    modality=mm, kv_cache=kv,
                                    cache_index=0, return_hidden=True)
        return _head(params, hidden[:, Lt:], ss, t), kv

    def cache_step(params, x, t, modality, kv):
        sigma = noise.total(t)
        x_img = x[:, Lt:]
        mod_img = modality[:, Lt:]
        if use_cfg:
            xx = jnp.concatenate([x_img, x_img], 0)
            ss = jnp.concatenate([sigma, sigma], 0)
            mm = jnp.concatenate([mod_img, mod_img], 0)
        else:
            xx, ss, mm = x_img, sigma, mod_img
        _, hidden, kv = model.apply({"params": params}, xx, ss,
                                    modality=mm, kv_cache=kv,
                                    cache_index=Lt, return_hidden=True)
        return _head(params, hidden, ss, t), kv

    def frozen_txt_kv(kv):
        """Extract the READ-ONLY text-prefix K/V from a built full cache:
        (fk, fv), each (n_blocks, BB, Lt, H, D) bf16. An int8 cache is
        dequantized once here — the frozen path always attends in bf16
        (the prefix is a loop-invariant read, not the bandwidth-bound
        long-context regime int8 KV exists for)."""
        if len(kv) == 4:
            ckq, cks, cvq, cvs = kv
            fk = (ckq[:, :, :Lt].astype(jnp.float32)
                  * cks[:, :, :Lt]).astype(jnp.bfloat16)
            fv = (cvq[:, :, :Lt].astype(jnp.float32)
                  * cvs[:, :, :Lt]).astype(jnp.bfloat16)
            return fk, fv
        ck, cv = kv
        return ck[:, :, :Lt], cv[:, :, :Lt]

    def frozen_step(params, x, t, modality, frozen):
        """Image-rows forward against the frozen text K/V — no cache
        write-back (models/dit.py frozen_kv path). Returns raw only."""
        sigma = noise.total(t)
        x_img = x[:, Lt:]
        mod_img = modality[:, Lt:]
        if use_cfg:
            xx = jnp.concatenate([x_img, x_img], 0)
            ss = jnp.concatenate([sigma, sigma], 0)
            mm = jnp.concatenate([mod_img, mod_img], 0)
        else:
            xx, ss, mm = x_img, sigma, mod_img
        _, hidden = model.apply({"params": params}, xx, ss,
                                modality=mm, frozen_kv=frozen,
                                cache_index=Lt, return_hidden=True)
        return _head(params, hidden, ss, t)

    return cache_full, cache_step, frozen_txt_kv, frozen_step


def build_t2i_sampler(model, config: Config,
                      num_steps: Optional[int] = None,
                      return_trajectory: bool = False,
                      inject_noise: bool = False,
                      cached_cond: bool = False,
                      cond_refresh: int = 0) -> Callable:
    """sample(params, rng, txt_tokens (B, txt_len), modality) ->
    SampleResult over the full [txt | img] sequence.

    return_trajectory=True additionally returns the (steps, B, L) token
    state after every denoise step (for denoise-strip viz and schedule
    tests).

    inject_noise=True: parity-harness mode (same contract as
    build_sampler) — `sample` takes an extra `injected` dict:
    "gumbel_tok" (steps, B, Li, img_vocab) token-pick Gumbel noise and
    "gumbel_conf" (steps, B, Li) confidence noise, replacing the JAX
    RNG draws so the rolling t2i batcher can be matched
    token-for-token.

    cached_cond=True: conditioning-frozen fast path — the text K/V are
    cached and every denoise step runs the trunk over the image rows only
    (img_log_weights_cached_fn). cond_refresh > 0 rebuilds the cache every
    that-many steps (cond_refresh=1 degenerates to a full forward each
    step, which must match cached_cond=False token-for-token — tested);
    cond_refresh=0 caches once at step 0."""
    cfg = config
    m = cfg.model
    s = cfg.sampling
    steps = num_steps or s.steps
    Lt, Li, L = m.txt_length, m.img_length, m.length
    v0 = m.text_vocab_size
    mask_index = m.mask_index
    if cached_cond:
        from unidisc_tpu.sampling.ar_sampler import init_kv_cache_for
        (cache_full, cache_step, frozen_txt_kv,
         frozen_step) = img_log_weights_cached_fn(model, config)
        use_cfg = s.cfg is not None
    else:
        img_log_weights = img_log_weights_fn(model, config)

    # dilated unmasking groups (PAPERS.md "Plan for Speed"): group id per
    # image-grid position = (row % d) * d + (col % d); same-group tokens
    # are >= d apart in both axes. Constant folded into the jitted graph.
    dilation = s.maskgit_dilation
    if dilation and dilation > 1:
        import numpy as _np
        side = int(round(Li ** 0.5))
        if side * side != Li:
            raise ValueError(
                f"maskgit_dilation needs a square image grid; "
                f"img_length={Li} is not a perfect square")
        rr, cc = _np.meshgrid(_np.arange(side), _np.arange(side),
                              indexing="ij")
        group_of_pos = jnp.asarray(
            ((rr % dilation) * dilation + (cc % dilation)).reshape(-1))
        n_groups = dilation * dilation
    else:
        group_of_pos = None
        n_groups = 1

    def sample(params, rng, txt_tokens, modality=None, injected=None):
        assert (injected is not None) == inject_noise
        b = txt_tokens.shape[0]
        if modality is None:
            modality = jnp.concatenate(
                [jnp.zeros((b, Lt), jnp.int32),
                 jnp.ones((b, Li), jnp.int32)], -1)
        x = jnp.concatenate(
            [txt_tokens, jnp.full((b, Li), mask_index, jnp.int32)], -1)
        schedule = adaptive_schedule(jnp.full((b,), Li), steps,
                                     s.maskgit_mode)
        timesteps = jnp.linspace(1.0, s.sampling_eps, steps + 1)
        kv0 = init_kv_cache_for(m, 2 * b if use_cfg else b, L) \
            if cached_cond else None

        def update(x, raw, t, i, k_tok, k_g):
            """One maskgit confidence update from the raw image-span
            log-weights; i may be a traced scan index or a static int."""
            i = jnp.asarray(i)
            g = injected["gumbel_tok"][i].astype(raw.dtype) \
                if inject_noise else \
                jax.random.gumbel(k_tok, raw.shape, dtype=raw.dtype)
            pred_local = jnp.argmax(raw + g, axis=-1)          # (B, Li)
            lse = jax.nn.logsumexp(raw, axis=-1)
            conf = jnp.take_along_axis(raw, pred_local[..., None],
                                       -1).squeeze(-1) - lse
            img = x[:, Lt:]
            copy = img != mask_index
            eligible = ~copy
            if group_of_pos is not None:
                # rotate through dilated groups; the final n_groups steps
                # are unrestricted so stragglers always finish
                in_group = group_of_pos[None, :] == (i % n_groups)
                restrict = i < steps - n_groups
                eligible = eligible & (in_group | ~restrict)
            # clamp the quota to eligible candidates: with fewer finite
            # confidences than the quota the threshold would be -inf and
            # -inf >= -inf unmasks everything at once (ADVICE round-1 bug)
            num = jnp.minimum(schedule[:, i], eligible.sum(-1))
            gumbel = injected["gumbel_conf"][i] if inject_noise else \
                jax.random.gumbel(k_g, conf.shape)
            conf = conf + s.maskgit_r_temp * gumbel * t[:, None]
            conf = jnp.where(eligible, conf, -jnp.inf)
            thresh = confidence_threshold(conf, num)
            img_next = jnp.where((conf >= thresh) & eligible,
                                 pred_local + v0, img)
            return x.at[:, Lt:].set(img_next)

        frozen = None
        if cached_cond and cond_refresh == 0:
            # FROZEN fast path: the one full pass sees exactly the initial
            # state, so hoist it (and step 0's update) out of the scan —
            # the scan body is then a pure img-rows forward against the
            # read-only text K/V: no cache write-back, no lax.cond
            # whole-cache copies (those made the kv_cache variant
            # throughput-neutral at 115M, BASELINE.md)
            rng, k_tok, k_g = jax.random.split(rng, 3)
            t0 = jnp.full((b,), timesteps[0])
            raw0, kvfull = cache_full(params, x, t0, modality, kv0)
            frozen = frozen_txt_kv(kvfull)
            x = update(x, raw0, t0, 0, k_tok, k_g)
            x0_state = x
            scan_steps = jnp.arange(1, steps)
        else:
            scan_steps = jnp.arange(steps)

        def step_weights(x, t, kv, i):
            if not cached_cond:
                return img_log_weights(params, x, t, modality), kv
            if frozen is not None:
                return frozen_step(params, x, t, modality, frozen), kv
            is_full = (i % cond_refresh) == 0
            return jax.lax.cond(
                is_full,
                lambda a: cache_full(params, *a),
                lambda a: cache_step(params, *a),
                (x, t, modality, kv))

        def body(carry, i):
            x, rng, kv = carry
            rng, k_tok, k_g = jax.random.split(rng, 3)
            t = jnp.full((b,), timesteps[i])
            raw, kv = step_weights(x, t, kv, i)
            x_next = update(x, raw, t, i, k_tok, k_g)
            return ((x_next, rng, kv),
                    (x_next if return_trajectory else None))

        kv_carry = None if frozen is not None else kv0
        (x, rng, kv), traj = jax.lax.scan(body, (x, rng, kv_carry),
                                          scan_steps)
        if return_trajectory and frozen is not None:
            traj = jnp.concatenate([x0_state[None], traj], axis=0)
        # noise removal — the arccos schedule provably unmasks everything
        # (per-step quota >= remaining/threshold selects >= quota), so this
        # full pass only executes in the degenerate all-clamped case
        any_left = (x[:, Lt:] == mask_index).any()

        def remove_noise(args):
            x, kv = args
            t = jnp.full((b,), s.sampling_eps)
            if frozen is not None:
                raw = frozen_step(params, x, t, modality, frozen)
            elif cached_cond:
                raw, _ = cache_step(params, x, t, modality, kv)
            else:
                raw = img_log_weights(params, x, t, modality)
            img = x[:, Lt:]
            img = jnp.where(img == mask_index,
                            jnp.argmax(raw, -1) + v0, img)
            return x.at[:, Lt:].set(img)

        x = jax.lax.cond(any_left, remove_noise, lambda a: a[0], (x, kv))
        nfe = steps + jnp.where(any_left, 1, 0)
        result = SampleResult(tokens=x, nfe=nfe.astype(jnp.int32))
        return (result, traj) if return_trajectory else result

    return sample
