"""Mosaic int8 dot vs XLA int8 dot at production trunk shapes.

VERDICT weak #7: round 2's hand-tiled Mosaic int8 dot lost to XLA
(136 vs 205 TOPS at the 115M qkv shape); ops/int8_matmul.py re-schedules
it (full-K slabs, fused bf16 epilogue, weight-resident grid order). This
sweep measures both paths with the trusted methodology (CLAUDE.md):
iterations chained through a feedback dependency inside one jitted
fori_loop (defeats LICM/elision), bf16 epilogue outputs (int32/f32
outputs are output-write-bound at these shapes), host-transfer barrier.

Prints one JSON line per (shape, backend, blocks) cell with achieved
TOPS (2*M*N*K per dot).

MEASURED CAVEAT (round 3, v5e-1): the XLA cells of THIS harness are not
trustworthy — the int8-xor feedback chain defeats XLA's epilogue fusion
and some cells read 3-17 TOPS where the same dot inside the model runs
at ~200 TOPS. The decisive numbers are the in-model A/Bs
(model.quant_backend='pallas' vs 'xla' through the real sampler):
115M 5826 vs 6655 tok/s, 1.4B 871 vs 963 tok/s — XLA wins in-model at
both scales (it fuses the quantize chain around the dot; the pallas_call
boundary costs more than the fused epilogue saves). Default stays
'xla'; the kernel remains a tested option for chips/shapes where the
balance differs.

Run: python scripts/bench_int8_dot.py [--iters 64]
"""
import argparse
import itertools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

# (tag, M, K, N) — 115M trunk (h=768, B8xL384 cfg-doubled = 6144 rows)
# and 1.4B trunk (h=2048, B4xL384 cfg-doubled = 3072 rows)
SHAPES = [
    ("115m_qkv", 6144, 768, 2304),
    ("115m_mlp_up", 6144, 768, 3072),
    ("115m_mlp_down", 6144, 3072, 768),
    ("1p4b_qkv", 3072, 2048, 6144),
    ("1p4b_mlp_up", 3072, 2048, 8192),
    ("1p4b_mlp_down", 3072, 8192, 2048),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--blocks", default="512x512,1024x512,512x1024,"
                    "1024x1024,1536x512,2048x512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.ops.int8_matmul import int8_matmul, xla_reference

    rng = np.random.default_rng(0)
    it = args.iters

    def bench(fn, xq, s, wq, ws):
        """Chain `it` dots through a feedback dep; time the whole loop."""
        def body(i, carry):
            out = fn(carry, s, wq, ws)
            # feed a data-dependent int8 perturbation back into x_q so no
            # iteration can be hoisted or elided
            fb = (out[:1, :1].astype(jnp.int32) & 1).astype(jnp.int8)
            return jnp.bitwise_xor(carry, fb[0, 0])

        looped = jax.jit(lambda xq: jax.lax.fori_loop(0, it, body, xq))
        looped(xq).block_until_ready()
        t0 = time.perf_counter()
        r = looped(xq)
        np.asarray(r[:1, :1])  # host-transfer barrier (tunnel-safe)
        return (time.perf_counter() - t0) / it

    for tag, m, k, n in SHAPES:
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        s = jnp.asarray(rng.random((m, 1), np.float32) + 0.5)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.asarray(rng.random((n,), np.float32) + 0.5)
        tops = 2 * m * n * k / 1e12

        dt = bench(lambda x, s, w, v: xla_reference(x, s, w, v), xq, s,
                   wq, ws)
        best = {"backend": "xla", "tops": round(tops / dt, 1),
                "us": round(dt * 1e6, 1)}
        print(json.dumps({"shape": tag, "mnk": [m, n, k], **best}),
              flush=True)

        for spec in args.blocks.split(","):
            bm, bn = (int(v) for v in spec.split("x"))
            dt = bench(lambda x, s, w, v, bm=bm, bn=bn: int8_matmul(
                x, s, w, v, block_m=bm, block_n=bn), xq, s, wq, ws)
            print(json.dumps({"shape": tag, "backend": "pallas",
                              "blocks": spec, "tops": round(tops / dt, 1),
                              "us": round(dt * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
