"""Probe: does the axon TPU platform support host memory kinds?

If `pinned_host` shardings work end-to-end, a host-offloaded optimizer
becomes possible: bf16 working params resident in HBM, fp32 master
params + optimizer state in host RAM, the update either computed on the
host (jax.experimental.compute_on) or streamed through the device in
slabs. That would let fp32-master 1.4B+ training fit one v5e chip
(today's answer is trainer.low_precision_params = pure-bf16 state, or
FSDP across chips).

Run standalone (ONE TPU process at a time — the chip is 16GB shared):
    python scripts/probe_host_offload.py
Prints one JSON line with which capabilities work.
"""
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    out = {"platform": dev.platform, "device": str(dev)}

    # 1. pinned_host placement
    try:
        s_host = jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host")
        x = jax.device_put(jnp.ones((256, 256), jnp.float32), s_host)
        out["pinned_host_put"] = str(x.sharding.memory_kind) == "pinned_host"
    except Exception as e:  # noqa: BLE001 — capability probe
        out["pinned_host_put"] = False
        out["pinned_host_put_err"] = repr(e)[:200]

    # 2. jit with host-resident input/output (device round-trip)
    if out.get("pinned_host_put"):
        try:
            s_dev = jax.sharding.SingleDeviceSharding(dev)

            @jax.jit
            def bump(h):
                return h + 1.0

            y = jax.jit(bump, in_shardings=s_host, out_shardings=s_host)(x)
            out["jit_host_io"] = (
                str(y.sharding.memory_kind) == "pinned_host"
                and float(np.asarray(y)[0, 0]) == 2.0)
        except Exception as e:  # noqa: BLE001
            out["jit_host_io"] = False
            out["jit_host_io_err"] = repr(e)[:200]

        # 3. compute_on("device_host") — host-side XLA computation
        try:
            from jax.experimental import compute_on

            @jax.jit
            def host_update(h):
                with compute_on.compute_on("device_host"):
                    return h * 2.0

            z = jax.jit(host_update, in_shardings=s_host,
                        out_shardings=s_host)(x)
            out["compute_on_host"] = float(np.asarray(z)[0, 0]) == 2.0
        except Exception as e:  # noqa: BLE001
            out["compute_on_host"] = False
            out["compute_on_host_err"] = repr(e)[:200]

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
