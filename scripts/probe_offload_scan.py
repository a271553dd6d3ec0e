"""Probe: does lax.scan STREAM host-resident xs/ys chunk-by-chunk?

Why: optimization_barrier does NOT serialize host->HBM streaming copies
— XLA's host-offload legalization walks through barriers, so a chunked
unrolled loop still stages every chunk at program start (measured OOM:
25.5G of copy-start temps at 1.4B, scripts/bench_offload.py). A scan's
per-iteration dynamic-slice is loop-carried, so the copy cannot be
hoisted: staging should be bounded at ~1-2 chunks (double buffering).

Method: AOT-compile (lower().compile()) both the scan version and the
unrolled version over a 20GB host-resident f32[K,C] and read
memory_analysis().temp_size_in_bytes — no data ever moves, so no OOM
roulette and no tunnel traffic. Then a small (0.25GB) scan actually
EXECUTES to check numerics + output memory kind.

Run: python scripts/probe_offload_scan.py [--gb-total 20] [--chunks 8]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb-total", type=float, default=20.0)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev,
                                               memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)
    K = args.chunks
    C = int(args.gb_total * (1 << 30) / 4 / K)
    out = {"chunks": K, "chunk_mb": round(C * 4 / (1 << 20), 1),
           "total_gb": round(K * C * 4 / (1 << 30), 2)}

    def body(carry, x):
        y = x * 2.0 + carry
        return carry + 1.0, y

    def scan_fn(xs):
        return jax.lax.scan(body, jnp.float32(1.0), xs)

    def unrolled_fn(xs):
        carry = jnp.float32(1.0)
        ys = []
        for i in range(K):
            carry, y = body(carry, xs[i])
            ys.append(y)
        return carry, jnp.stack(ys)

    big = jax.ShapeDtypeStruct((K, C), jnp.float32, sharding=s_host)

    for name, fn in (("scan", scan_fn), ("unrolled", unrolled_fn)):
        try:
            compiled = jax.jit(
                fn, out_shardings=(s_dev, s_host)).lower(big).compile()
            ma = compiled.memory_analysis()
            out[name] = {
                "ok": True,
                "temp_gb": round(ma.temp_size_in_bytes / (1 << 30), 2),
                "argument_gb": round(
                    ma.argument_size_in_bytes / (1 << 30), 2),
                "output_gb": round(ma.output_size_in_bytes / (1 << 30), 2),
            }
        except Exception as e:  # noqa: BLE001 — capability probe
            msg = repr(e)
            i = msg.find("Ran out of memory")
            out[name] = {"ok": False,
                         "err": (msg[i:i + 160] if i >= 0 else msg[:300])}
        print(json.dumps({name: out[name]}), flush=True)

    # small EXECUTION check: numerics + ys memory kind
    try:
        Cs = max(1 << 20, 128)
        xs_small = jax.device_put(
            jnp.tile(jnp.arange(K, dtype=jnp.float32)[:, None], (1, Cs)),
            s_host)
        carry, ys = jax.jit(scan_fn,
                            out_shardings=(s_dev, s_host))(xs_small)
        _ = float(np.asarray(carry))
        v0, vl = jax.device_get(jax.jit(
            lambda ys: (ys[0, 0].astype(jnp.float32),
                        ys[K - 1, 0].astype(jnp.float32)))(ys))
        out["exec_small"] = {
            "ok": True,
            "ys_on_host": str(ys.sharding.memory_kind) == "pinned_host",
            "value_ok": float(v0) == 1.0
            and float(vl) == 2.0 * (K - 1) + K,
        }
    except Exception as e:  # noqa: BLE001 — capability probe
        out["exec_small"] = {"ok": False, "err": repr(e)[:300]}
    print(json.dumps({"exec_small": out["exec_small"]}), flush=True)


if __name__ == "__main__":
    main()
