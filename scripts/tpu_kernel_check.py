"""On-TPU Pallas kernel numerics check: fwd + grads vs the XLA oracle.

VERDICT round-1 weak #6: 'kernel correctness on real TPU rests on the bench
alone — all test_pallas_attention.py runs are interpret=True on CPU'. This
script runs the REAL compiled kernels on the attached chip across the shapes
the auto-policy serves, compares against ops.pallas_attention._xla_reference
(identical masking semantics), and writes KERNEL_CHECK.json at the repo root
as the per-round artifact.

Run: python scripts/tpu_kernel_check.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.ops.pallas_attention import flash_attention

# (B, L, H, D, causal, segmented) — production + long-seq + packed shapes
SHAPES = [
    (4, 384, 12, 64, False, False),    # 115M headline t2i
    (2, 1024, 12, 64, False, False),
    (2, 1024, 8, 128, False, False),
    (1, 4096, 8, 128, False, False),   # long-seq kernel
    (2, 512, 8, 128, True, False),     # causal (AR)
    (2, 1024, 8, 128, False, True),    # packed segment-ids
]


def xla_oracle(q, k, v, segment_ids, causal):
    from unidisc_tpu.ops.pallas_attention import _xla_reference
    scale = 1.0 / (q.shape[-1] ** 0.5)
    # oracle takes (B, H, L, D)
    t = lambda x: jnp.swapaxes(x, 1, 2)
    out = _xla_reference(t(q), t(k), t(v), segment_ids, causal, scale)
    return jnp.swapaxes(out, 1, 2)


def main():
    results = []
    ok = True
    for (b, l, h, d, causal, seg) in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(b * l + d), 4)
        q = jax.random.normal(ks[0], (b, l, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, l, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, l, h, d), jnp.bfloat16)
        segment_ids = None
        if seg:
            sid = jnp.cumsum(
                jax.random.bernoulli(ks[3], 0.005, (b, l)), -1
            ).astype(jnp.int32)
            segment_ids = (sid, sid)

        def f_pallas(q, k, v):
            return flash_attention(q, k, v, segment_ids=segment_ids,
                                   causal=causal).astype(jnp.float32).sum()

        def f_xla(q, k, v):
            return xla_oracle(q, k, v, segment_ids,
                              causal).astype(jnp.float32).sum()

        out_p = jax.jit(lambda q, k, v: flash_attention(
            q, k, v, segment_ids=segment_ids, causal=causal))(q, k, v)
        out_x = jax.jit(lambda q, k, v: xla_oracle(
            q, k, v, segment_ids, causal))(q, k, v)
        fwd_err = float(jnp.max(jnp.abs(
            out_p.astype(jnp.float32) - out_x.astype(jnp.float32))))

        gp = jax.jit(jax.grad(f_pallas, argnums=(0, 1, 2)))(q, k, v)
        gx = jax.jit(jax.grad(f_xla, argnums=(0, 1, 2)))(q, k, v)
        grad_err = max(
            float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                  b_.astype(jnp.float32))))
            for a, b_ in zip(gp, gx))

        # bf16 inputs, fp32 accum: tolerances match the CPU-interpret tests
        shape_ok = fwd_err < 2e-2 and grad_err < 5e-2
        ok &= shape_ok
        rec = {"shape": f"B{b} L{l} H{h} D{d}"
                        f"{' causal' if causal else ''}"
                        f"{' seg' if seg else ''}",
               "fwd_max_abs_err": round(fwd_err, 6),
               "grad_max_abs_err": round(grad_err, 6),
               "ok": bool(shape_ok)}
        results.append(rec)
        print(rec, flush=True)

    artifact = {"platform": jax.devices()[0].platform,
                "device": str(jax.devices()[0]),
                "all_ok": bool(ok), "shapes": results}
    with open("/root/repo/KERNEL_CHECK.json", "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"all_ok": ok}))


if __name__ == "__main__":
    main()
