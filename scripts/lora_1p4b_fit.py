"""1.4B LoRA fine-tuning on ONE v5e chip — the fit + throughput check.

Full-state 1.4B training does NOT fit a single v5e-1 (BASELINE.md: fp32
params 5.6G + EMA 5.6G + grads + temps > 15.75G even with adafactor).
LoRA changes the arithmetic: the base tree is a frozen bf16 constant
(the reference also runs its LoRA path on a bf16 base,
model_setup.py:119 torch_dtype under use_lora), and optimizer/EMA/grad
state is rank-r sized — so the largest production model trains on the
chip the full path needs a pod slice for.

Prints one JSON line per config: tokens/sec and step time for the
jitted LoRA train step (remat on) at B x 384.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import init_dit
from unidisc_tpu.training.lora import (count_lora_params, init_lora,
                                       lora_param_map)
from unidisc_tpu.training.train_state import (init_train_state,
                                              make_train_step)


def main():
    batch_sizes = [int(b) for b in
                   (sys.argv[1].split(",") if len(sys.argv) > 1 else ["8"])]
    cfg = Config.make("extra_large").apply_experiments("vq16_t2i").override(
        **{"model.lora_rank": 16, "model.dropout": 0.0,
           "trainer.use_gradient_checkpointing": True,
           "trainer.warmup_steps": 1, "trainer.lr": 1e-4})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m, remat=True)
    n_base = sum(int(np.prod(p.shape))
                 for p in jax.tree_util.tree_leaves(params))
    # frozen bf16 base (reference: bf16 torch_dtype under use_lora)
    base = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params)
    del params
    adapter = init_lora(jax.random.PRNGKey(1), base, rank=m.lora_rank)
    pmap = lora_param_map(base, alpha=m.lora_alpha, rank=m.lora_rank)
    state = init_train_state(cfg, adapter)
    step = jax.jit(make_train_step(cfg, model, param_map=pmap),
                   donate_argnums=(0,))

    for B in batch_sizes:
        rng = jax.random.PRNGKey(3)
        mod = jnp.concatenate(
            [jnp.zeros((B, m.txt_length), jnp.int32),
             jnp.ones((B, m.img_length), jnp.int32)], -1)
        batch = {"input_ids": jax.random.randint(
            rng, (B, m.length), 0, m.text_vocab_size), "modality": mod}
        state, mtr = step(state, batch, jax.random.PRNGKey(4))  # compile
        np.asarray(mtr.loss)
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, mtr = step(state, batch, jax.random.PRNGKey(5))
        np.asarray(mtr.loss)  # tunnel-safe barrier (scalar)
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "what": "lora_1p4b_train_step", "batch": B,
            "seq": m.length, "rank": m.lora_rank,
            "trainable_params": count_lora_params(adapter),
            "base_params": n_base,
            "s_per_step": round(dt, 4),
            "tok_per_s": round(B * m.length / dt, 1),
            "loss": round(float(mtr.loss), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
