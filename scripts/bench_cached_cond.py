"""A/B: conditioning-frozen t2i sampling (cached text K/V, image-rows-only
trunk steps) vs the plain span-factored sampler.

At the production t2i layout (128 txt + 256 img) a cached step runs the
trunk over 2/3 of the rows; the sampler is trunk-matmul-bound (BASELINE.md),
so the predicted ceiling is ~1.5x on trunk time, ~1.3-1.4x end-to-end.
In-process A/B (same chip, same process) is the trusted ratio — the
tunneled chip's absolute numbers vary +-10-15% between runs.

Run: python scripts/bench_cached_cond.py [--scale small|extra_large]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.ops.quant import quantize_model
from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler

STEPS = 32
WARMUP = 2
ITERS = 5


def time_sampler(sample, params, txt, gen_tokens, iters=ITERS):
    rng = jax.random.PRNGKey(1)
    for _ in range(WARMUP):
        np.asarray(sample(params, rng, txt).tokens)
    t0 = time.perf_counter()
    for i in range(iters):
        np.asarray(sample(params, jax.random.fold_in(rng, i), txt).tokens)
    dt = (time.perf_counter() - t0) / iters
    return gen_tokens / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="small",
                    choices=["small", "extra_large"])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    if args.scale == "small":
        from __graft_entry__ import _flagship_config
        cfg = _flagship_config()
        batch = args.batch or 8
    else:
        from unidisc_tpu.config import Config
        cfg = Config.make("extra_large").apply_experiments("vq16_t2i")
        batch = args.batch or 4
    cfg = cfg.override(**{
        "sampling.predictor": "maskgit", "sampling.steps": STEPS,
        "sampling.cfg": 2.0, "model.dropout": 0.0,
        "model.logits_dtype": "bfloat16"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qcfg, qmodel, qparams = quantize_model(cfg, params)
    txt = jnp.ones((batch, m.txt_length), jnp.int32)
    gen = batch * m.img_length

    results = {}
    for name, kw in [("plain", {}),
                     ("cached0", dict(cached_cond=True, cond_refresh=0)),
                     ("cached8", dict(cached_cond=True, cond_refresh=8))]:
        sample = jax.jit(build_t2i_sampler(qmodel, qcfg, **kw))
        results[name] = round(time_sampler(sample, qparams, txt, gen), 1)

    print(json.dumps({
        "metric": f"cached_cond_ab_{args.scale}",
        "unit": f"tok/s (b{batch} x {STEPS}-step maskgit+CFG, int8 W8A8)",
        **results,
        "cached0_vs_plain": round(results["cached0"] / results["plain"], 3),
        "cached8_vs_plain": round(results["cached8"] / results["plain"], 3),
    }))


if __name__ == "__main__":
    main()
