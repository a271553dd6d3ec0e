"""Diagnose the 1.4B B4->B8 sampling anti-scaling (round-3 VERDICT #9).

Round 2 measured 964 tok/s @B4 int8 but 783 @B8 — per-token throughput
should be monotone until the chip saturates. The 115M B32 cliff was
root-caused to fp32 score spills (fixed by score chunking); this harness
asks the same question at 1.4B:

  1. per-batch timing sweep (B2/4/6/8/12) of the int8 t2i sampler,
     per-token + per-batch, so the knee is visible;
  2. component timings at B4 vs B8: bare forward, forward+argmax,
     full sampler step — isolating whether the knee is in the trunk
     matmuls, the (B, L, 48k) logits epilogue, or the sampler glue;
  3. optional jax.profiler traces (--trace DIR) at B4 and B8 for XProf.

Prints one JSON line per measurement.

Run: python scripts/diag_1p4b_batch.py [--trace /tmp/xprof]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.ops.quant import quantize_model
from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler

STEPS = 32


def timed(fn, *a, iters=3, warmup=1):
    # transfer only a tiny slice as the completion barrier (the tunnel
    # makes block_until_ready unreliable and full transfers expensive)
    def run():
        leaf = jax.tree_util.tree_leaves(fn(*a))[0]
        return np.asarray(leaf.reshape(-1)[:8])

    for _ in range(warmup):
        run()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="write jax.profiler traces for B4/B8 here")
    ap.add_argument("--batches", default="2,4,6,8,12")
    args = ap.parse_args()

    cfg = Config.make("extra_large").apply_experiments("vq16_t2i").override(
        **{"sampling.predictor": "maskgit", "sampling.steps": STEPS,
           "sampling.cfg": 2.0, "model.dropout": 0.0,
           "model.logits_dtype": "bfloat16"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qcfg, qmodel, qparams = quantize_model(cfg, params)

    batches = [int(b) for b in args.batches.split(",")]

    # ---- 1. sampler sweep -------------------------------------------------
    for B in batches:
        sample = jax.jit(build_t2i_sampler(qmodel, qcfg))
        txt = jnp.zeros((B, m.txt_length), jnp.int32)
        dt = timed(lambda t: sample(qparams, jax.random.PRNGKey(1),
                                    t).tokens, txt)
        print(json.dumps({
            "what": "sampler", "batch": B,
            "s_per_batch": round(dt, 4),
            "tok_per_s": round(B * m.img_length / dt, 1),
            "s_per_step_per_row": round(dt / STEPS / B * 1e3, 3),
        }), flush=True)

    # ---- 2. component timings at the knee --------------------------------
    def fwd(p, x, sigma, mod):
        return qmodel.apply({"params": p}, x, sigma, modality=mod)

    for B in (4, 8):
        # CFG doubles the effective forward batch inside the sampler
        for eff, tag in ((B, "fwd"), (2 * B, "fwd_cfg_batch")):
            x = jnp.zeros((eff, m.length), jnp.int32)
            sig = jnp.full((eff,), 0.5)
            mod = jnp.concatenate(
                [jnp.zeros((eff, m.txt_length), jnp.int32),
                 jnp.ones((eff, m.img_length), jnp.int32)], -1)
            f = jax.jit(fwd)
            dt = timed(lambda: f(qparams, x, sig, mod))
            # amortize dispatch: chain 8 forwards through a scalar
            # feedback dependency (XLA elides independent repeats)
            g = jax.jit(lambda p, x: jax.lax.fori_loop(
                0, 8, lambda i, y: fwd(
                    p, x + (y.sum() * 0).astype(jnp.int32), sig, mod),
                fwd(p, x, sig, mod)))
            dt8 = timed(lambda: g(qparams, x))
            print(json.dumps({
                "what": tag, "batch": B, "eff_batch": eff,
                "s_single": round(dt, 4),
                "s_chained8_each": round(dt8 / 8, 4),
            }), flush=True)

    # ---- 3. traces ---------------------------------------------------------
    if args.trace:
        for B in (4, 8):
            sample = jax.jit(build_t2i_sampler(qmodel, qcfg))
            txt = jnp.zeros((B, m.txt_length), jnp.int32)
            np.asarray(sample(qparams, jax.random.PRNGKey(1),
                              txt).tokens)  # warm
            with jax.profiler.trace(f"{args.trace}/b{B}"):
                np.asarray(sample(qparams, jax.random.PRNGKey(2),
                                  txt).tokens)
            print(json.dumps({"what": "trace", "batch": B,
                              "dir": f"{args.trace}/b{B}"}), flush=True)


if __name__ == "__main__":
    main()
