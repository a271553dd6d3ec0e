"""Dense-vs-MoE train-step A/B (single chip).

Measures the fully-jitted train step (fwd+bwd+AdamW+EMA, remat) at the
115M flagship shape with the block MLP swapped for the capacity-routed
MoE (models/moe.py, model.moe_experts > 0), against the dense baseline.

What the single-chip cell can and cannot show:
  * it CAN show the dispatch/combine overhead honestly — on one chip
    there is no 'ep' axis, so the (S,E,C) one-hot einsums and the
    stacked-expert MLP run fully resident; the measured tok/s is the
    per-chip cost of the MoE layer at top-k routing;
  * it CANNOT show expert-parallel scaling (all_to_alls over ICI) —
    that path is exercised functionally by dryrun_multichip(8) on the
    (fsdp2 x ep4) mesh and the test_moe.py loss-parity test; perf
    curves need real chips.

Per-token FLOPs accounting: top-1 routing activates the same MLP FLOPs
as dense (one expert of identical (dim, ff) shape) plus the router
(dim*E) and the dispatch/combine one-hot contractions; top-2 activates
2x the MLP FLOPs. "active_params" below counts router + k experts +
the shared trunk, i.e. the dense-equivalent model the FLOPs pay for,
while "params" counts all E experts.

Run: python scripts/bench_moe.py [--experts 8 --top-k 1,2 --batch 32]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run_cell(cfg, B, label):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.training.train_state import (init_train_state,
                                                  make_train_step)

    m = cfg.model
    model, params = init_dit(
        jax.random.PRNGKey(0), m,
        remat=cfg.trainer.use_gradient_checkpointing)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    # active = total minus the (E-k)/E inactive share of the stacked
    # expert weights (blocks/moe/{w1,b1,w2,b2}, leading E axis; the
    # router stays fully active)
    n_active = n_params
    if m.moe_experts > 0:
        k = min(m.moe_top_k, m.moe_experts)
        expert = sum(
            int(np.prod(p.shape))
            for path, p in jax.tree_util.tree_leaves_with_path(params)
            if any(getattr(s, "key", "") == "moe" for s in path)
            and not any(getattr(s, "key", "") == "router" for s in path)
            and p.shape[0] == m.moe_experts)
        n_active = n_params - expert * (m.moe_experts - k) // m.moe_experts
    state = init_train_state(cfg, params)
    del params
    step_fn = jax.jit(make_train_step(cfg, model))

    rng = jax.random.PRNGKey(1)
    k1, _ = jax.random.split(rng)
    txt = jax.random.randint(k1, (B, m.txt_length), 0,
                             m.text_vocab_size - 1)
    img = jax.random.randint(k1, (B, m.img_length),
                             m.text_vocab_size, m.vocab_size)
    batch = {"input_ids": jnp.concatenate([txt, img], -1).astype(jnp.int32),
             "modality": jnp.concatenate(
                 [jnp.zeros((B, m.txt_length), jnp.int32),
                  jnp.ones((B, m.img_length), jnp.int32)], -1)}

    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    np.asarray(metrics.loss)  # compile + barrier

    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            state, metrics = step_fn(state, batch,
                                     jax.random.fold_in(rng, w * 4 + i))
        np.asarray(metrics.loss)  # barrier (tunnel-safe)
        times.append((time.perf_counter() - t0) / 4)
    dt = min(times)
    tok_per_s = B * m.length / dt
    out = {
        "cell": label, "params": n_params, "active_params": n_active,
        "batch": B, "seq": m.length, "s_per_step": round(dt, 4),
        "tok_per_s": round(tok_per_s, 1),
        "loss": round(float(np.asarray(metrics.loss)), 4),
    }
    del state, step_fn
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--top-k", default="1,2")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--capacity", type=float, default=1.25)
    ap.add_argument("--low-precision", action="store_true",
                    help="trainer.low_precision_params (bf16 state) — the "
                    "8-expert tree at 115M-trunk scale is ~560M params; "
                    "its fp32 AdamW state does not fit one 16G chip next "
                    "to remat activations (measured OOM at B16/B32)")
    ap.add_argument("--only", default=None,
                    help="run one cell (dense | k<K>) — per-process cells "
                    "guarantee a clean HBM between A/B arms")
    ap.add_argument("--dense-tok-per-s", type=float, default=None,
                    help="with --only k<K>: the dense arm's measured "
                    "tok/s for the vs_dense ratio")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from unidisc_tpu.config import Config

    base_over = {"trainer.use_gradient_checkpointing": True,
                 "model.dropout": 0.0}
    if args.low_precision:
        base_over["trainer.low_precision_params"] = True
    tiny = {"model.hidden_size": 64, "model.n_blocks": 2,
            "model.n_heads": 2} if args.cpu else {}

    dense_ref = args.dense_tok_per_s
    if args.only in (None, "dense"):
        cfg = Config.make("small").apply_experiments("vq16_t2i").override(
            **base_over, **tiny)
        dense = run_cell(cfg, args.batch, "dense")
        print(json.dumps(dense), flush=True)
        dense_ref = dense["tok_per_s"]
    if args.only == "dense":
        return

    for k in [int(v) for v in args.top_k.split(",")]:
        if args.only is not None and args.only != f"k{k}":
            continue
        cfg_m = Config.make("small").apply_experiments("vq16_t2i").override(
            **base_over, **tiny,
            **{"model.moe_experts": args.experts,
               "model.moe_top_k": k,
               "model.moe_capacity_factor": args.capacity})
        cell = run_cell(cfg_m, args.batch, f"moe_e{args.experts}_k{k}")
        if dense_ref:
            cell["vs_dense"] = round(cell["tok_per_s"] / dense_ref, 3)
        print(json.dumps(cell), flush=True)


if __name__ == "__main__":
    main()
