"""Per-round training-throughput benchmark (single chip).

Measures the fully-jitted train step (fwd+bwd+AdamW+EMA, remat per
trainer.use_gradient_checkpointing) at the two tracked scales:
  - 115M flagship, B32 x L384 (remat — B32 fwd+bwd needs it, CLAUDE.md)
  - 1.4B extra_large, B32 x L384 remat (the production recipe shape,
    reference configs/experiments/large_scale_train.yaml:115-151)

Prints one JSON line per scale: tokens/sec/chip, model TF/s (6*N*L per
token, the reference's throughput_monitor.py:549 convention) and MFU vs
the v5e bf16 peak (197 TF/s).

Timing: chained steps inside one process with host-transfer barriers
(the tunnel makes block_until_ready unreliable); per-step time is the
min over measured windows of 4 steps each.

Run: python scripts/bench_train.py [--scales 115m,1p4b]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

PEAK_TFLOPS = 197.0  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="115m",
                    help="115m and/or 1p4b. NOTE: 1p4b full train state "
                    "does not fit one v5e chip even with adafactor "
                    "(fp32 params 5.6G + EMA 5.6G + grads + remat "
                    "temps > 15.75G HBM) — it is an FSDP workload "
                    "(parallel/mesh.py; CPU-mesh step tested); the "
                    "cell is kept for future multi-chip runs")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--remat-policy", default="none",
                    help="none | dots | dots_all (model.remat_policy)")
    ap.add_argument("--low-precision", action="store_true",
                    help="trainer.low_precision_params: bf16 params + "
                    "EMA + optimizer state — halves the train-state "
                    "HBM. At 1.4B, bf16 AdamW still OOMs (measured); "
                    "combine with --optimizer adafactor for the "
                    "resident single-chip cell, or use "
                    "scripts/bench_offload.py for fp32-master AdamW")
    ap.add_argument("--optimizer", default=None,
                    help="override the trainer optimizer (default: "
                    "preset's adamw; the 1p4b fp32 cell forces "
                    "adafactor to fit)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.training.train_state import (init_train_state,
                                                  make_train_step)

    for scale in args.scales.split(","):
        preset = {"115m": "small", "1p4b": "extra_large"}[scale]
        over = {"trainer.use_gradient_checkpointing": True,
                "model.remat_policy": args.remat_policy,
                "model.dropout": 0.0}
        if args.low_precision:
            over["trainer.low_precision_params"] = True
        B = args.batch
        if args.optimizer:
            over["trainer.optimizer"] = args.optimizer
        if scale == "1p4b":
            if args.low_precision:
                # bf16 params/EMA/moments: full AdamW state is ~11.2G —
                # measured NOT to fit next to grads+activations (B8 and
                # B16 both OOM); --optimizer adafactor is the resident
                # bf16 cell, the fp32-master AdamW path is
                # scripts/bench_offload.py
                B = min(B, 16)
            else:
                # fp32 AdamW m/v + EMA at 1.4B is ~22GB — a multi-chip
                # (FSDP) workload; the single-chip fp32 bench uses
                # adafactor (factored second moment) + a smaller batch
                over["trainer.optimizer"] = "adafactor"
                B = min(B, 8)
        cfg = Config.make(preset).apply_experiments("vq16_t2i").override(
            **over)
        if args.cpu:
            cfg = cfg.override(**{
                "model.hidden_size": 64, "model.n_blocks": 2,
                "model.n_heads": 2})
        m = cfg.model
        model, params = init_dit(
            jax.random.PRNGKey(0), m,
            remat=cfg.trainer.use_gradient_checkpointing)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(params))
        state = init_train_state(cfg, params)
        del params
        step_fn = jax.jit(make_train_step(cfg, model))

        rng = jax.random.PRNGKey(1)
        k1, _ = jax.random.split(rng)
        txt = jax.random.randint(k1, (B, m.txt_length), 0,
                                 m.text_vocab_size - 1)
        img = jax.random.randint(k1, (B, m.img_length),
                                 m.text_vocab_size, m.vocab_size)
        batch = {"input_ids": jnp.concatenate([txt, img], -1).astype(
                     jnp.int32),
                 "modality": jnp.concatenate(
                     [jnp.zeros((B, m.txt_length), jnp.int32),
                      jnp.ones((B, m.img_length), jnp.int32)], -1)}

        # warmup (compile)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
        np.asarray(metrics.loss)

        times = []
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(4):
                state, metrics = step_fn(state, batch,
                                         jax.random.fold_in(rng, w * 4 + i))
            np.asarray(metrics.loss)  # barrier
            times.append((time.perf_counter() - t0) / 4)
        dt = min(times)

        tokens = B * m.length
        tok_per_s = tokens / dt
        # fwd+bwd model FLOPs/token ~ 6*N (reference model_setup.py:823);
        # remat recompute is NOT counted (same convention as BASELINE)
        tf_per_s = 6.0 * n_params * tok_per_s / 1e12
        print(json.dumps({
            "scale": scale, "remat_policy": args.remat_policy,
            "params": n_params, "batch": B,
            "seq": m.length, "s_per_step": round(dt, 4),
            "tok_per_s": round(tok_per_s, 1),
            "model_tflops_per_s": round(tf_per_s, 1),
            "mfu_vs_v5e_peak": round(tf_per_s / PEAK_TFLOPS, 3),
            "loss": round(float(np.asarray(metrics.loss)), 4),
        }), flush=True)
        del state, step_fn


if __name__ == "__main__":
    main()
