"""1.4B fp32-master training on ONE v5e chip via host offload.

Measures the offload train step (training/offload.py: bf16 working
weights in HBM; fp32 master + optimizer moments + EMA in pinned_host;
a fixed pipeline of jitted programs — grad, K x chunk update, assemble)
at the production shape, and verifies state placement. Companion to
scripts/bench_train.py --low-precision (the pure-bf16-state mode);
BASELINE.md records both.

Run: python scripts/bench_offload.py [--batch 8] [--scale 1p4b|115m]
     [--optimizer adamw|lion] [--chunks 8]
One TPU process at a time (16GB HBM is shared).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--scale", default="1p4b")
    ap.add_argument("--optimizer", default="adamw",
                    help="fp32 AdamW moments live on the HOST, so the "
                    "full optimizer fits — no adafactor compromise")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--chunks", type=int, default=8,
                    help="flat host-state pieces per step; each chunk-"
                    "update program's HBM transient is ~5x(state/chunks)"
                    " — 8 fits 1.4B AdamW on a 16G v5e "
                    "(training/offload.py)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.training.offload import (init_offload_state,
                                              make_offload_train_step)

    preset = {"115m": "small", "1p4b": "extra_large"}[args.scale]
    cfg = Config.make(preset).apply_experiments("vq16_t2i").override(**{
        "trainer.use_gradient_checkpointing": True,
        "trainer.optimizer": args.optimizer,
        "model.dropout": 0.0,
    })
    m = cfg.model
    B = args.batch
    model, params = init_dit(jax.random.PRNGKey(0), m, remat=True)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    state = init_offload_state(cfg, params, annotate=True,
                               chunks=args.chunks)
    del params
    # placement checks: every master/moment/EMA chunk on the host, the
    # working weights in HBM
    mk = {l.sharding.memory_kind
          for part in (state.masters, state.mus, state.nus, state.emas)
          for l in jax.tree_util.tree_leaves(part)}
    wk = {l.sharding.memory_kind
          for l in jax.tree_util.tree_leaves(state.params)}
    assert mk == {"pinned_host"}, mk
    assert wk == {"device"}, wk

    step_fn = make_offload_train_step(cfg, model, annotate=True)

    rng = jax.random.PRNGKey(1)
    k1, _ = jax.random.split(rng)
    txt = jax.random.randint(k1, (B, m.txt_length), 0,
                             m.text_vocab_size - 1)
    img = jax.random.randint(k1, (B, m.img_length), m.text_vocab_size,
                             m.vocab_size)
    batch = {"input_ids": jnp.concatenate([txt, img], -1).astype(jnp.int32),
             "modality": jnp.concatenate(
                 [jnp.zeros((B, m.txt_length), jnp.int32),
                  jnp.ones((B, m.img_length), jnp.int32)], -1)}

    # barrier that waits for the WHOLE pipeline (the last host write),
    # via a scalar pulled from the final state — np.asarray is the only
    # reliable completion barrier on the axon tunnel
    probe = jax.jit(lambda w: w.reshape(-1)[0].astype(jnp.float32))

    def barrier(state):
        return float(np.asarray(probe(state.masters[-1])))

    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    barrier(state)  # compile + barrier

    times = []
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(args.steps // 3):
            state, metrics = step_fn(state, batch,
                                     jax.random.fold_in(rng, w * 4 + i))
        barrier(state)
        times.append((time.perf_counter() - t0) / max(args.steps // 3, 1))
    dt = min(times)

    # post-run placement + dtype integrity
    lm = state.masters[0]
    lw = jax.tree_util.tree_leaves(state.params)[0]
    tok_per_s = B * m.length / dt
    tf_per_s = 6.0 * n_params * tok_per_s / 1e12
    print(json.dumps({
        "scale": args.scale, "optimizer": args.optimizer,
        "chunks": args.chunks,
        "params": n_params, "batch": B, "seq": m.length,
        "s_per_step": round(dt, 4), "tok_per_s": round(tok_per_s, 1),
        "model_tflops_per_s": round(tf_per_s, 1),
        "mfu_vs_v5e_peak": round(tf_per_s / 197.0, 3),
        "master_memory": str(lm.sharding.memory_kind),
        "master_dtype": str(lm.dtype),
        "work_memory": str(lw.sharding.memory_kind),
        "work_dtype": str(lw.dtype),
        "loss": round(float(np.asarray(metrics.loss)), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
