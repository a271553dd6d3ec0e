"""Isolate which chunked-host-compute construct the axon remote
compiler accepts. Variants (each 4 chunks x --gb, compiled fresh):

  v1_single   one compute_on section over ONE chunk (the known-working
              bench_offload.py shape, as a control)
  v2_multi    K independent compute_on sections, no chaining
  v3_hosttok  K sections chained by a HOST-resident scalar token
  v4_devtok   K sections chained by a device scalar produced inside the
              previous host section (the pattern that just failed)

Run: python scripts/probe_offload_variants.py [--gb 0.25]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=0.25)
    ap.add_argument("--chunks", type=int, default=4)
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
    K = args.chunks

    def mk_hosts(k):
        return [jax.device_put(jnp.full((side, side), float(i)), s_host)
                for i in range(k)]

    results = {}

    def run(name, fn, *xs):
        try:
            t0 = time.perf_counter()
            out = jax.jit(fn)(*xs)
            tok = jax.tree_util.tree_leaves(out)[-1]
            _ = np.asarray(tok)
            results[name] = {"ok": True,
                             "compile_s": round(time.perf_counter() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            msg = repr(e)
            for key in ("Ran out of memory", "NOT_FOUND", "INVALID_ARGUMENT",
                        "does not support", "Unsupported"):
                i = msg.find(key)
                if i >= 0:
                    msg = msg[i:i + 300]
                    break
            else:
                msg = msg[-300:]
            results[name] = {"ok": False, "err": msg}
        print(json.dumps({name: results[name]}), flush=True)

    # v1: single section (control)
    def v1(h):
        with compute_on.compute_on("device_host"):
            nh = h + 1.0
        nh = jax.device_put(nh, s_host)
        with compute_on.compute_on("device_host"):
            t = nh[0, 0]
        return nh, t

    run("v1_single", v1, mk_hosts(1)[0])

    # v2: K independent sections
    def v2(hs):
        outs = []
        for h in hs:
            with compute_on.compute_on("device_host"):
                nh = h + 1.0
            outs.append(jax.device_put(nh, s_host))
        with compute_on.compute_on("device_host"):
            t = outs[-1][0, 0]
        return outs, t

    run("v2_multi", v2, mk_hosts(K))

    # v3: chained by a host-resident token
    def v3(hs, tok):
        outs = []
        for h in hs:
            with compute_on.compute_on("device_host"):
                nh = h + 1.0 + tok * 0.0
                tok = nh[0, 0]
            outs.append(jax.device_put(nh, s_host))
        return outs, tok

    run("v3_hosttok", v3, mk_hosts(K),
        jax.device_put(jnp.zeros(()), s_host))

    # v4: chained by a device token (previously failing pattern)
    def v4(hs, g):
        outs = []
        token = g[0, 0]
        for h in hs:
            with compute_on.compute_on("device_host"):
                nh = h + 1.0 + token * 0.0
                tok = nh[0, 0]
            outs.append(jax.device_put(nh, s_host))
            token = tok
        return outs, token

    run("v4_devtok", v4, mk_hosts(K),
        jax.device_put(jnp.ones((8, 8)), s_dev))

    print(json.dumps({"summary": {k: v.get("ok") for k, v in
                                  results.items()}}), flush=True)


if __name__ == "__main__":
    main()
