"""Diffusion serving A/B: rolling continuous batching vs whole-batch.

Workload: N text->image requests with staggered arrivals. Whole-batch
(the reference's serving model and our micro-batching engine) admits
only at batch boundaries: a request arriving just after a 32-step batch
started waits the full batch before its own begins. Rolling batching
(serving/rolling.py) admits into finished slots mid-flight — each row
carries its own denoise step.

Three modes, same chip, same 115M int8 W8A8 model:
  whole_generic — whole-batch on the generic sampler (the apples-to-
                  apples baseline: same forward as rolling);
  whole_t2ifast — whole-batch on the span-factored t2i fast path (the
                  throughput-optimal batch sampler, for context);
  rolling       — RollingDiffusionBatcher (generic forward).

Prints one JSON line per mode: generated-token throughput + request
latency mean/p50/p90 (arrival -> completion).

Run: python scripts/bench_rolling.py [--requests 16] [--slots 8]
         [--arrival-ms 150] [--cpu]
"""
import argparse
import json
import sys
import threading
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--arrival-ms", type=float, default=150.0)
    ap.add_argument("--mixed", action="store_true",
                    help="add a mixed-NFE rolling cell (half the "
                    "requests at steps/4 — ragged row_steps)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.ops.quant import quantize_model
    from unidisc_tpu.sampling.sampler import build_sampler
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    from unidisc_tpu.serving.rolling import (RollingDiffusionBatcher,
                                             RollingT2IBatcher)

    cfg = _flagship_config().override(**{
        "sampling.predictor": "maskgit", "sampling.steps": args.steps,
        "sampling.cfg": 2.0, "model.logits_dtype": "bfloat16"})
    if args.cpu:
        cfg = cfg.override(**{
            "model.hidden_size": 64, "model.n_blocks": 2,
            "model.n_heads": 2, "model.length": 24,
            "model.txt_length": 8, "model.img_length": 16,
            "model.text_vocab_size": 61, "model.image_vocab_size": 16,
            "sampling.steps": min(args.steps, 4)})
    m = cfg.model
    steps = cfg.sampling.steps
    model, params = init_dit(jax.random.PRNGKey(0), m)
    qcfg, qmodel, qparams = quantize_model(cfg, params)

    def forward_logits(p, x, sigma, modality):
        return qmodel.apply({"params": p}, x, sigma, modality=modality)

    N = args.requests
    S = args.slots
    rng = np.random.RandomState(0)
    txts = rng.randint(1, min(50, m.text_vocab_size - 9),
                       (N, m.txt_length)).astype(np.int32)
    x0 = np.zeros((N, m.length), np.int32)
    x0[:, :m.txt_length] = txts
    unmask = np.zeros((N, m.length), bool)
    unmask[:, :m.txt_length] = True
    modality = np.concatenate(
        [np.zeros((m.txt_length,), np.int32),
         np.ones((m.img_length,), np.int32)])[None].repeat(N, 0)
    gap = args.arrival_ms / 1e3

    def percentiles(lat):
        lat = sorted(lat)
        p = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]
        return {"lat_mean_s": round(sum(lat) / len(lat), 3),
                "lat_p50_s": round(p(0.5), 3), "lat_p90_s": round(p(0.9), 3)}

    def report(mode, t0, done_t, arrive_t):
        span = max(done_t) - t0
        lat = [d - a for d, a in zip(done_t, arrive_t)]
        print(json.dumps({
            "mode": mode, "requests": N, "slots": S, "steps": steps,
            "gen_tok_per_s": round(N * m.img_length / span, 1),
            **percentiles(lat)}), flush=True)

    # ---- whole-batch modes -------------------------------------------------
    def run_whole(mode, sampler_call):
        pending = []
        done_t = [0.0] * N
        arrive_t = [0.0] * N
        lock = threading.Lock()
        stop = threading.Event()

        def feeder():
            for i in range(N):
                with lock:
                    pending.append(i)
                    arrive_t[i] = time.perf_counter()
                time.sleep(gap)

        t0 = time.perf_counter()
        th = threading.Thread(target=feeder)
        th.start()
        served = 0
        while served < N:
            with lock:
                group, pending[:] = pending[:S], pending[S:]
            if not group:
                time.sleep(0.002)
                continue
            # pad to a power of two <= S (the micro-batcher's shapes)
            b = 1
            while b < len(group):
                b *= 2
            idx = group + [group[-1]] * (b - len(group))
            sampler_call(np.asarray(idx))
            t = time.perf_counter()
            for i in group:
                done_t[i] = t
            served += len(group)
        th.join()
        stop.set()
        report(mode, t0, done_t, arrive_t)

    generic = jax.jit(build_sampler(forward_logits, qcfg))
    fast = jax.jit(build_t2i_sampler(qmodel, qcfg))

    def call_generic(idx):
        out = generic(qparams, jax.random.PRNGKey(1), jnp.asarray(x0[idx]),
                      jnp.asarray(unmask[idx]), jnp.asarray(modality[idx]))
        np.asarray(out.tokens[:1, :1])

    def call_fast(idx):
        out = fast(qparams, jax.random.PRNGKey(1), jnp.asarray(txts[idx]))
        np.asarray(out.tokens[:1, :1])

    # warm both compile caches at the power-of-two shapes
    for b in {1, 2, 4, S}:
        call_generic(np.arange(b) % N)
        call_fast(np.arange(b) % N)

    run_whole("whole_generic", call_generic)
    run_whole("whole_t2ifast", call_fast)

    # ---- rolling -----------------------------------------------------------
    batcher = RollingDiffusionBatcher(forward_logits, qparams, qcfg,
                                      slots=S, chunk=args.chunk)
    batcher.warmup()  # pre-compile all admission buckets + chunk
    # and one request end-to-end through the worker loop
    batcher.submit(x0[0], unmask[0], modality[0], seed=0).result(timeout=600)

    done_t = [0.0] * N
    arrive_t = [0.0] * N
    futs = [None] * N
    all_done = threading.Event()
    remaining = [N]
    t0 = time.perf_counter()

    def on_done(i):
        def cb(_):
            done_t[i] = time.perf_counter()  # timestamp at completion
            remaining[0] -= 1
            if remaining[0] == 0:
                all_done.set()
        return cb

    def feeder_roll():
        for i in range(N):
            arrive_t[i] = time.perf_counter()
            f = batcher.submit(x0[i], unmask[i], modality[i], seed=i)
            f.add_done_callback(on_done(i))
            futs[i] = f
            time.sleep(gap)

    th = threading.Thread(target=feeder_roll)
    th.start()
    th.join()
    all_done.wait(timeout=600)
    report("rolling", t0, done_t, arrive_t)
    batcher.shutdown()

    # ---- rolling on the span-factored t2i path ----------------------------
    t2i_b = RollingT2IBatcher(qmodel, qparams, qcfg, slots=S,
                              chunk=args.chunk)
    t2i_b.warmup()
    t2i_b.submit(txts[0], seed=0).result(timeout=600)

    done_t = [0.0] * N
    arrive_t = [0.0] * N
    all_done = threading.Event()
    remaining = [N]
    t0 = time.perf_counter()

    def feeder_t2i():
        for i in range(N):
            arrive_t[i] = time.perf_counter()
            f = t2i_b.submit(txts[i], seed=i)
            f.add_done_callback(on_done(i))
            time.sleep(gap)

    th = threading.Thread(target=feeder_t2i)
    th.start()
    th.join()
    all_done.wait(timeout=600)
    report("rolling_t2i", t0, done_t, arrive_t)

    if args.mixed:
        # mixed NFE workload: half the requests are 8-step "fast" rows
        # — they share the SAME rolling batch (ragged row_steps), which
        # whole-batch serving cannot do at all (it would need separate
        # per-step-count batches). Latency split reported per class.
        fast_steps = max(1, steps // 4)
        done_t = [0.0] * N
        arrive_t = [0.0] * N
        all_done = threading.Event()
        remaining = [N]
        t0 = time.perf_counter()
        for i in range(N):
            arrive_t[i] = time.perf_counter()
            f = t2i_b.submit(txts[i], seed=i,
                             steps=fast_steps if i % 2 else steps)
            f.add_done_callback(on_done(i))
            time.sleep(gap)
        all_done.wait(timeout=600)
        lat = [d - a for d, a in zip(done_t, arrive_t)]
        span = max(done_t) - t0
        print(json.dumps({
            "mode": "rolling_t2i_mixed", "requests": N, "slots": S,
            "full_steps": steps, "fast_steps": fast_steps,
            "gen_tok_per_s": round(N * m.img_length / span, 1),
            "lat_mean_full_s": round(
                sum(lat[0::2]) / len(lat[0::2]), 3),
            "lat_mean_fast_s": round(
                sum(lat[1::2]) / len(lat[1::2]), 3)}), flush=True)
    t2i_b.shutdown()


if __name__ == "__main__":
    main()
