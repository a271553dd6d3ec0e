"""Single-chip ring-attention block benchmark at the 8192 stress shape
(round-3 VERDICT #6): XLA-block ring vs flash-kernel ring vs the plain
fused flash kernel, all at ring size n=1 (one v5e chip — the multi-chip
ICI path is validated on the CPU mesh; this measures the per-step BLOCK
math that dominates ring wall-time).

The XLA block materializes fp32 (B, H, Lc, Lc) scores per step — at
L=8192, H=12, B=1 that is 3.2 GB of score traffic per block; the flash
ring keeps O(Lc) residuals. Prints one JSON line per variant.

Run: python scripts/bench_ring8192.py [--len 8192] [--heads 12] [--dim 64]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, iters=3, warmup=1):
    def run():
        return np.asarray(fn(*a).reshape(-1)[:8])
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
    ap.add_argument("--len", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--causal", action="store_true")
    args = ap.parse_args()

    from jax.sharding import Mesh, PartitionSpec as P

    from unidisc_tpu.ops.pallas_attention import flash_attention
    from unidisc_tpu.parallel.ring_attention import (ring_attention,
                                                     ring_attention_flash)

    B, L, H, D = args.batch, args.len, args.heads, args.dim
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, L, H, D), jnp.bfloat16)
    flops = 4.0 * B * H * L * L * D * (0.5 if args.causal else 1.0)

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("seq",))
    spec = P(None, "seq", None, None)

    def shard1(fn):
        return jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3,
                                     out_specs=spec, check_vma=False))

    variants = {
        "ring_xla_block": shard1(
            lambda q, k, v: ring_attention(q, k, v,
                                           causal=args.causal)),
        "ring_flash_block": shard1(
            lambda q, k, v: ring_attention_flash(q, k, v,
                                                 causal=args.causal)),
        # flash_attention takes (B, L, H, D) directly
        "fused_flash_kernel": jax.jit(
            lambda q, k, v: flash_attention(q, k, v, causal=args.causal)),
    }

    results = {}
    for name, fn in variants.items():
        try:
            dt = timed(fn, q, k, v)
        except Exception as e:  # noqa: BLE001 — OOM at the stress shape
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        results[name] = dt
        print(json.dumps({
            "variant": name, "L": L, "B": B, "H": H, "D": D,
            "causal": args.causal, "s": round(dt, 4),
            "tflops_per_s": round(flops / dt / 1e12, 1)}), flush=True)
    if "ring_xla_block" in results and "ring_flash_block" in results:
        print(json.dumps({
            "metric": "ring_flash_vs_xla_block_speedup",
            "value": round(results["ring_xla_block"]
                           / results["ring_flash_block"], 3)}), flush=True)


if __name__ == "__main__":
    main()
