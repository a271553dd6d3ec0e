"""Serving-throughput A/B: continuous batching vs static batches.

Workload: N AR text requests with mixed prompt lengths and mixed
max_new_tokens arriving at once. Static batching (the reference's
serving model: whole batches decoded to completion, demo/server.py)
pays head-of-line blocking — every row decodes until the LONGEST
request in its batch finishes, and slots freed early stay idle.
Continuous batching (serving/continuous.py) refills slots the moment a
row retires.

Prints one JSON line per mode with aggregate generated-token throughput
and mean request latency.

Run: python scripts/bench_serving.py [--requests 32] [--slots 8]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--arrival-ms", type=float, default=0.0,
                    help="inter-arrival gap; 0 = all at once (the static "
                    "baseline's best case)")
    ap.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"],
                    help="decode KV cache dtype (int8 halves cache reads; "
                    "A/B at --slots 16+ where decode is cache-bound)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import DIT, init_dit
    from unidisc_tpu.ops.quant import quantize_dit_params
    from unidisc_tpu.sampling.ar_sampler import (build_ar_sampler,
                                                 make_apply_token)
    from unidisc_tpu.serving.continuous import ContinuousBatcher

    import dataclasses

    cfg = Config.make("small").override(**{
        "model.length": 384, "model.txt_length": 384, "model.img_length": 0,
        "model.full_attention": False, "model.dropout": 0.0,
        "model.rope_2d": False,
        "trainer.parameterization": "ar",
        "sampling.cfg": None, "sampling.temperature": 0.0,
        "sampling.top_p": None})
    m = cfg.model
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qm = dataclasses.replace(m, quant="int8",
                             kv_cache_dtype=args.kv_cache)
    cfg = dataclasses.replace(cfg, model=qm)
    model = DIT(qm)
    params = quantize_dit_params(params)

    rng = np.random.RandomState(0)
    reqs = [dict(prompt=rng.randint(1, 1000, rng.choice([8, 16, 32, 48])
                                    ).tolist(),
                 max_new=int(rng.choice([16, 32, 64, 96])))
            for _ in range(args.requests)]
    total_new = sum(r["max_new"] for r in reqs)

    # --- static batching baseline: groups of `slots`, each decoded to the
    # group's max needed length (generous to the baseline: the reference
    # decodes the full sequence, demo/server.py; we trim to a 64-bucket
    # of max(prompt)+max(max_new) so it only pays head-of-line blocking)
    samplers = {}

    def static_sampler(length):
        if length not in samplers:
            c2 = dataclasses.replace(
                cfg, model=dataclasses.replace(
                    qm, length=length, txt_length=length))
            samplers[length] = jax.jit(
                build_ar_sampler(make_apply_token(DIT(c2.model)), c2))
        return samplers[length]

    def run_static():
        t0 = time.perf_counter()
        lat = []  # per-request latency (arrival -> its group finishing)
        for g in range(0, len(reqs), args.slots):
            group = reqs[g:g + args.slots]
            b = len(group)
            if args.arrival_ms:
                # a static server can't start a group before its last
                # member has arrived
                ready = (g + b - 1) * args.arrival_ms / 1e3
                now = time.perf_counter() - t0
                if now < ready:
                    time.sleep(ready - now)
            need = max(len(r["prompt"]) for r in group) + \
                max(r["max_new"] for r in group)
            length = min(-(-need // 64) * 64, m.length)
            x0 = np.zeros((b, length), np.int32)
            unmask = np.zeros((b, length), bool)
            for i, r in enumerate(group):
                x0[i, :len(r["prompt"])] = r["prompt"]
                unmask[i, :len(r["prompt"])] = True
            out = static_sampler(length)(params, jax.random.PRNGKey(g),
                                         jnp.asarray(x0),
                                         jnp.asarray(unmask))
            np.asarray(out.tokens)
            # request i's latency runs from ITS arrival to group finish
            done = time.perf_counter() - t0
            for i in range(b):
                lat.append(done - (g + i) * args.arrival_ms / 1e3)
        return time.perf_counter() - t0, lat

    run_static()  # warm/compile
    dt_s, lat_s = run_static()

    # --- continuous batching
    # ONE batcher for warm + measured runs: a fresh batcher means fresh
    # closures, which re-trace every jitted program — the warm run must
    # populate the same jit caches the measured run uses (the static
    # baseline's module-level sampler dict already behaves this way)
    batcher = ContinuousBatcher(model, params, cfg, slots=args.slots,
                                chunk=args.chunk, eos_id=-1)

    def run_continuous():
        t0 = time.perf_counter()
        futs = []
        done_at = {}
        for i, r in enumerate(reqs):
            if args.arrival_ms and i:
                target = t0 + i * args.arrival_ms / 1e3
                now = time.perf_counter()
                if now < target:
                    time.sleep(target - now)
            f = batcher.submit(r["prompt"], max_new_tokens=r["max_new"],
                               temperature=0.0)
            f.add_done_callback(
                (lambda i: lambda _: done_at.__setitem__(
                    i, time.perf_counter()))(i))
            futs.append(f)
        for f in futs:
            f.result(timeout=1200)
        lat = [done_at[i] - (t0 + i * args.arrival_ms / 1e3)
               for i in range(len(reqs))]
        return time.perf_counter() - t0, lat

    try:
        run_continuous()  # warm/compile
        dt_c, lat_c = run_continuous()
    finally:
        batcher.shutdown()

    for name, dt, lat in (("static_batches", dt_s, lat_s),
                          ("continuous", dt_c, lat_c)):
        print(json.dumps({
            "mode": name, "requests": args.requests, "slots": args.slots,
            "kv_cache": args.kv_cache,
            "wall_s": round(dt, 3),
            "gen_tok_per_s": round(total_new / dt, 1),
            "mean_latency_s": round(float(np.mean(lat)), 3),
            # latency TAIL: drain skipping adds EOS-detection delay —
            # bounded by the wall-clock drain deadline since round 3
            "p50_latency_s": round(float(np.percentile(lat, 50)), 3),
            "p95_latency_s": round(float(np.percentile(lat, 95)), 3)}))
    print(json.dumps({"metric": "continuous_vs_static_speedup",
                      "value": round(dt_s / dt_c, 3)}))

    # --- automatic prefix caching A/B: a shared-system-prompt workload
    # (the scenario prefix caching exists for) with the cache off vs on
    sysp = rng.randint(1, 1000, 64).tolist()
    pre_reqs = [dict(prompt=sysp + rng.randint(1, 1000,
                                               rng.choice([4, 8, 12])
                                               ).tolist(),
                     max_new=32) for _ in range(args.requests)]
    pre_total = sum(r["max_new"] for r in pre_reqs)

    def run_prefixed(prefix_min):
        b = ContinuousBatcher(model, params, cfg, slots=args.slots,
                              chunk=args.chunk, eos_id=-1,
                              prefix_min=prefix_min)
        try:
            for _ in range(2):  # warm, then measure
                t0 = time.perf_counter()
                futs = [b.submit(r["prompt"],
                                 max_new_tokens=r["max_new"],
                                 temperature=0.0) for r in pre_reqs]
                outs = [f.result(timeout=1200)["tokens"] for f in futs]
                dt = time.perf_counter() - t0
            return dt, outs, b.prefix_hits
        finally:
            b.shutdown()

    dt_off, out_off, _ = run_prefixed(0)
    dt_on, out_on, hits = run_prefixed(16)
    assert out_on == out_off, "prefix caching must be lossless"
    print(json.dumps({
        "metric": "prefix_cache_speedup",
        "value": round(dt_off / dt_on, 3),
        "prefix_hits": hits, "requests": len(pre_reqs),
        "gen_tok_per_s_off": round(pre_total / dt_off, 1),
        "gen_tok_per_s_on": round(pre_total / dt_on, 1),
        "lossless": True}))


if __name__ == "__main__":
    main()
