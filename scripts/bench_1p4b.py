"""1.4B-class (extra_large) headline bench: t2i sampling + training fwd/bwd.

The north-star target is >=5x reference per-chip sampling throughput at
1.4B (BASELINE.md). bench.py holds the driver's single-line 115M headline;
this script tracks the extra_large numbers per round. Prints one JSON line.

Run: python scripts/bench_1p4b.py
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler

BATCH = 4
STEPS = 32


def main():
    cfg = Config.make("extra_large").apply_experiments("vq16_t2i").override(
        **{"sampling.predictor": "maskgit", "sampling.steps": STEPS,
           "sampling.cfg": 2.0, "model.dropout": 0.0,
           "model.logits_dtype": "bfloat16"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))

    # int8 W8A8 inference (ops/quant.py): measured 1.52x over bf16 at this
    # config (628 -> 954 tok/s @B4, round 2)
    from unidisc_tpu.ops.quant import quantize_model

    cfg, model, params = quantize_model(cfg, params)

    txt = jnp.zeros((BATCH, m.txt_length), jnp.int32)
    rng = jax.random.PRNGKey(1)

    def timed(sampler, p):
        np.asarray(sampler(p, rng, txt).tokens)  # compile+warm
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(sampler(p, jax.random.fold_in(rng, i), txt).tokens)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    sample = jax.jit(build_t2i_sampler(model, cfg))
    dt = timed(sample, params)
    tps = BATCH * m.img_length / dt

    # fast_nfe preset (8-NFE dilated maskgit — the configuration that
    # crosses the >=5x north star; quality evidence for the dilated
    # schedule comes from scripts/nfe_quality_ab.py at the largest
    # on-chip-trainable scale, recorded in BASELINE.md)
    fast_cfg = cfg.apply_experiments("fast_nfe")
    fast_sample = jax.jit(build_t2i_sampler(model, fast_cfg))
    fast_tps = BATCH * m.img_length / timed(fast_sample, params)

    # conditioning-frozen fast path (round 5, sampling/t2i_fast.py
    # cached_cond): text K/V once, image-rows-only denoise steps —
    # approximate (quality-A/B'd, nfe_quality_ab.py --mode cached);
    # measured alone at 32 steps and composed with fast_nfe (8-NFE)
    frozen_sample = jax.jit(build_t2i_sampler(model, cfg,
                                              cached_cond=True))
    frozen_tps = BATCH * m.img_length / timed(frozen_sample, params)
    frozen_fast_sample = jax.jit(build_t2i_sampler(model, fast_cfg,
                                                   cached_cond=True))
    frozen_fast_tps = BATCH * m.img_length / timed(frozen_fast_sample,
                                                   params)

    # CFG-distilled serving stack (round 5, training/distill.py
    # guidance=): a guided-distilled student samples with
    # sampling.cfg=None — HALF the rows per forward — and composes with
    # frozen_cond + fast_nfe. Quality gate: scripts/cfg_distill_ab.py
    # (student-no-CFG matches the guided teacher token-acc on the
    # synthetic task). Throughput is weight-independent, so the cell
    # runs on the same random weights as the rest.
    nocfg_fast = fast_cfg.override(**{"sampling.cfg": None})
    nocfg_sample = jax.jit(build_t2i_sampler(model, nocfg_fast,
                                             cached_cond=True))
    distilled_stack_tps = BATCH * m.img_length / timed(nocfg_sample,
                                                       params)

    # ---- baseline: per-step host-synced loop in bf16 (the reference's
    # serving architecture: one sampler step per dispatch with a host
    # round-trip between steps, model_eval.py:2309; bf16 because the
    # reference has no int8 path) — anchors the >=5x north star at 1.4B
    from unidisc_tpu.sampling.sampler import build_sampler

    bf16_cfg = Config.make("extra_large").apply_experiments(
        "vq16_t2i").override(
        **{"sampling.predictor": "maskgit", "sampling.steps": 1,
           "sampling.cfg": 2.0, "model.dropout": 0.0,
           "sampling.noise_removal": False,
           "model.logits_dtype": "bfloat16"})
    bf16_model, _ = init_dit(jax.random.PRNGKey(0), bf16_cfg.model)

    def forward_logits(p, x, sigma, modality):
        return bf16_model.apply({"params": p}, x, sigma,
                                modality=modality)
    one_step = jax.jit(build_sampler(forward_logits, bf16_cfg))
    # bf16 params for the baseline (the quantized tree fits the int8
    # model only)
    _, bf16_params = init_dit(jax.random.PRNGKey(0), bf16_cfg.model)
    x0 = jnp.zeros((BATCH, m.length), jnp.int32)
    unmask = jnp.zeros((BATCH, m.length), bool).at[:, :m.txt_length].set(
        True)
    modality = jnp.concatenate(
        [jnp.zeros((BATCH, m.txt_length), jnp.int32),
         jnp.ones((BATCH, m.img_length), jnp.int32)], -1)

    def loop_sample(rng):
        x = jnp.where(unmask, x0, m.mask_index)
        for i in range(STEPS):
            r = jax.random.fold_in(rng, i)
            x = one_step(bf16_params, r, jnp.where(unmask, x0, x),
                         unmask, modality).tokens
            x = jnp.asarray(np.asarray(x))  # host sync per step
        return x

    loop_sample(rng)  # compile+warm
    t0 = time.perf_counter()
    loop_sample(jax.random.fold_in(rng, 77))
    base_dt = time.perf_counter() - t0
    base_tps = BATCH * m.img_length / base_dt

    # bf16 scan at 32 steps: architecture-only ratio (no int8 lever)
    bf16_scan = jax.jit(build_t2i_sampler(
        bf16_model, bf16_cfg.override(**{"sampling.steps": STEPS,
                                         "sampling.noise_removal": True})))
    bf16_tps = BATCH * m.img_length / timed(bf16_scan, bf16_params)

    print(json.dumps({
        "metric": "sample_tokens_per_sec_1p4b",
        "value": round(tps, 2),
        "unit": f"tok/s (b{BATCH} x {STEPS}-step maskgit+CFG, "
                f"{n_params/1e9:.2f}B, 1 chip)",
        "p50_batch_latency_s": round(dt, 3),
        "baseline_loop_tok_per_s": round(base_tps, 2),
        "vs_baseline": round(tps / base_tps, 3),
        "vs_baseline_arch_bf16": round(bf16_tps / base_tps, 3),
        "bf16_scan_tok_per_s": round(bf16_tps, 2),
        "fast_nfe_tok_per_s": round(fast_tps, 2),
        "fast_nfe_vs_baseline": round(fast_tps / base_tps, 3),
        "frozen_cond_tok_per_s": round(frozen_tps, 2),
        "frozen_cond_vs_baseline": round(frozen_tps / base_tps, 3),
        "frozen_fast_nfe_tok_per_s": round(frozen_fast_tps, 2),
        "frozen_fast_nfe_vs_baseline": round(frozen_fast_tps / base_tps,
                                             3),
        "distilled_stack_tok_per_s": round(distilled_stack_tps, 2),
        "distilled_stack_vs_baseline": round(
            distilled_stack_tps / base_tps, 3),
    }))


if __name__ == "__main__":
    main()
