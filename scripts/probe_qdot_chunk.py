"""A/B probe for UNIDISC_QDOT_CHUNK_M (1.4B batch-knee mitigation).

BASELINE.md round-3 diagnosis: per-row trunk int8 cost rises 4.71 ->
5.75 ms/row (+22%) going eff-batch 8 -> 16 (M=3072 -> 6144 at K=2048
trunk shapes) — XLA's int8 dot schedule degrades with M. This probe
times the chained bare forward (the diag's trusted harness,
scripts/diag_1p4b_batch.py part 2) at eff 8/16 under the current
UNIDISC_QDOT_CHUNK_M setting; run it twice (0 and 3072) and compare.

Usage: UNIDISC_QDOT_CHUNK_M=3072 python scripts/probe_qdot_chunk.py
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
from unidisc_tpu.ops.quant import quantize_model


def timed(fn, iters=3, warmup=1):
    # host transfer is the only reliable barrier on the axon tunnel —
    # but it MUST be a tiny device-side slice: np.asarray of the full
    # (eff, 384, 48385) logits ships 300-600MB through the tunnel and
    # buries the measurement (CLAUDE.md timing notes)
    def barrier(out):
        x = jax.tree_util.tree_leaves(out)[0]
        np.asarray(x[(0,) * (x.ndim - 1)][:8])
    for _ in range(warmup):
        barrier(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    barrier(out)
    return (time.perf_counter() - t0) / iters


def main():
    chunk = int(os.environ.get("UNIDISC_QDOT_CHUNK_M", "0"))
    cfg = Config.make("extra_large").apply_experiments("vq16_t2i").override(
        **{"model.dropout": 0.0, "model.logits_dtype": "bfloat16"})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qcfg, qmodel, qparams = quantize_model(cfg, params)

    def fwd(p, x, sigma, mod):
        return qmodel.apply({"params": p}, x, sigma, modality=mod)

    for eff in (8, 16):
        x = jnp.zeros((eff, m.length), jnp.int32)
        sig = jnp.full((eff,), 0.5)
        mod = jnp.concatenate(
            [jnp.zeros((eff, m.txt_length), jnp.int32),
             jnp.ones((eff, m.img_length), jnp.int32)], -1)
        g = jax.jit(lambda p, x: jax.lax.fori_loop(
            0, 8, lambda i, y: fwd(
                p, x + (y.sum() * 0).astype(jnp.int32), sig, mod),
            fwd(p, x, sig, mod)))
        dt8 = timed(lambda: g(qparams, x))
        print(json.dumps({
            "chunk_m": chunk, "eff_batch": eff,
            "s_chained8_each": round(dt8 / 8, 4),
            "ms_per_row": round(dt8 / 8 / eff * 1e3, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
