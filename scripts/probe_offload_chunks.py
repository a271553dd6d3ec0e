"""Probe: does chaining compute_on("device_host") sections inside ONE
jit bound the HBM staging of host operands?

Background: the naive full-tree offload step OOMs at 1.4B because this
runtime stages every HostExecute operand through HBM simultaneously
(measured: 32.2G requested, scripts/bench_offload.py). If sequencing
the host sections with data dependencies lets XLA's buffer assignment
reuse the staging space, a chunked offload fits.

Builds N host-resident arrays of `chunk_gb` each (total > HBM if staged
at once), then one jitted program that updates them in a dependency
chain. OOM => staging is NOT bounded; success => build the chunked
offload trainer on this pattern.

POSTSCRIPT (round 4, after building it): the conclusion did NOT hold
at 1.4B — scalar-token chaining orders the section COMPUTE but not the
operand stagings, and optimization_barrier doesn't either (XLA's
host-offload legalize walks through barriers; 25.5G of hoisted
copy-starts, see training/offload.py's design notes and
probe_offload_scan.py). The shipped offload uses one small jitted
program per chunk instead. This probe's "success" at small sizes was
buffer slack, not serialization.

Run: python scripts/probe_offload_chunks.py [--chunks 8] [--gb 1.5]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--gb", type=float, default=1.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import compute_on

    dev = jax.devices()[0]
    s_host = jax.sharding.SingleDeviceSharding(dev,
                                               memory_kind="pinned_host")
    s_dev = jax.sharding.SingleDeviceSharding(dev)

    n_float = int(args.gb * (1 << 30) / 4)
    side = int(n_float ** 0.5)
    hosts = []
    for i in range(args.chunks):
        hosts.append(jax.device_put(
            jnp.full((side, side), float(i), jnp.float32), s_host))
    jax.block_until_ready(hosts)
    total_gb = args.chunks * side * side * 4 / (1 << 30)

    def step(chunks, g):
        outs = []
        token = g[0, 0]
        for h in chunks:
            # tie each chunk to the previous one's result (a scalar
            # produced INSIDE the previous host section) so XLA cannot
            # stage all host operands at once
            with compute_on.compute_on("device_host"):
                nh = h + 1.0 + token * 0.0
                tok = nh[0, 0]
            nh = jax.device_put(nh, s_host)
            token = tok
            outs.append(nh)
        return outs, token

    g = jax.device_put(jnp.ones((8, 8), jnp.float32), s_dev)
    fn = jax.jit(step)
    try:
        t0 = time.perf_counter()
        outs, token = fn(hosts, g)
        _ = float(np.asarray(token))  # barrier (tunnel-safe)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        outs, token = fn(outs, g)
        _ = float(np.asarray(token))
        step_s = time.perf_counter() - t0
        ok = all(str(o.sharding.memory_kind) == "pinned_host" for o in outs)
        # NOTE: slicing a pinned_host array directly ("outs[2][0,0]")
        # does not compile — "Async slice only supports slicing in 1
        # dimension" — scalars must be produced INSIDE the host section
        # (the step returns the last chunk's [0,0] as `token`)
        v = float(np.asarray(token))
        print(json.dumps({
            "ok": True, "chunks": args.chunks,
            "total_host_gb": round(total_gb, 2),
            "compile_s": round(compile_s, 1),
            "s_per_step": round(step_s, 3),
            "gbps_roundtrip": round(2 * total_gb / step_s, 1),
            "outputs_on_host": ok,
            "value_check": v == args.chunks - 1 + 2.0,
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — capability probe
        with open("/tmp/probe_chunks_err.txt", "w") as f:
            f.write(repr(e))
        print(json.dumps({"ok": False, "total_host_gb": round(total_gb, 2),
                          "err": "full error in /tmp/probe_chunks_err.txt"}),
              flush=True)


if __name__ == "__main__":
    main()
