"""Speculative-decoding A/B on real hardware (serving/speculative.py).

Protocol: train a target ELM and a much smaller draft ELM on a
low-entropy order-1 Markov byte task (both quickly learn the dominant
transitions, so greedy agreement — the thing speculative decoding
monetizes — is high without needing real checkpoints), then measure

  - plain one-scan cached greedy decode (the serving baseline),
  - speculative decode at gamma in {2, 4, 8}: tok/s + acceptance rate.

Speedup model (Leviathan et al.): E[speedup] ~ (1-a^(g+1)) /
((1-a)(g*c+1)) with a = per-token acceptance, c = draft/target cost.

Run: python scripts/bench_speculative.py [--target 270m] [--cpu]
Outputs one JSON line per cell.
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="270m")
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--train-batch", type=int, default=16)
    ap.add_argument("--train-len", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=32)
    ap.add_argument("--max-new", type=int, default=256)
    ap.add_argument("--gammas", default="2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quantize", choices=["int8"], default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    import optax

    from unidisc_tpu.models.elm import (ELM_PRESETS, ELMConfig, OpenELM,
                                        init_elm, init_elm_cache)
    from unidisc_tpu.serving.speculative import elm_spec_decoder

    VOCAB = 64
    L = args.train_len
    max_len = max(L, args.prompt_len + args.max_new + 16)

    base = ELM_PRESETS[args.target]
    t_cfg = dataclasses.replace(base, vocab_size=VOCAB, extra_tokens=0,
                                max_length=max_len)
    d_cfg = ELMConfig(vocab_size=VOCAB, extra_tokens=0, model_dim=128,
                      num_layers=2, head_dim=32, num_gqa_groups=2,
                      max_length=max_len)

    # ---- synthetic low-entropy Markov task ---------------------------
    rng = np.random.default_rng(0)
    perm = rng.permutation(VOCAB)            # dominant next-symbol map
    alt = rng.permutation(VOCAB)

    def sample_seq(r, n):
        out = np.empty(n, np.int64)
        out[0] = r.integers(VOCAB)
        u = r.random(n)
        for i in range(1, n):
            s = out[i - 1]
            out[i] = perm[s] if u[i] < 0.9 else (
                alt[s] if u[i] < 0.97 else r.integers(VOCAB))
        return out

    data = np.stack([sample_seq(rng, L)
                     for _ in range(args.train_batch * 8)]).astype(np.int32)

    def train(cfg, tag, steps):
        model, params = init_elm(jax.random.PRNGKey(0), cfg)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
        print(f"# {tag}: {n/1e6:.1f}M params", file=sys.stderr, flush=True)
        opt = optax.adamw(optax.warmup_cosine_decay_schedule(
            0.0, 3e-4, 20, max(steps, 21)))
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            def loss_fn(p):
                logits = model.apply({"params": p}, batch)
                lp = jax.nn.log_softmax(
                    logits[:, :-1].astype(jnp.float32), -1)
                tgt = batch[:, 1:]
                nll = -jnp.take_along_axis(
                    lp, tgt[..., None], -1)[..., 0]
                return nll.mean()
            loss, g = jax.value_and_grad(loss_fn)(params)
            upd, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, upd), opt_state, loss

        for i in range(steps):
            b = data[(i * args.train_batch) % len(data):][
                :args.train_batch]
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(b))
            if i % 100 == 0:
                print(f"# {tag} step {i} loss {float(loss):.4f}",
                      file=sys.stderr, flush=True)
        return model, params

    t_model, t_params = train(t_cfg, "target", args.train_steps)
    d_model, d_params = train(d_cfg, "draft", args.train_steps)

    if args.quantize == "int8":
        from unidisc_tpu.ops.quant import quantize_elm_params
        t_params = quantize_elm_params(t_params, t_cfg)
        t_cfg = dataclasses.replace(t_cfg, quant="int8")
        t_model = OpenELM(t_cfg)

    B = args.batch
    prompts = np.stack([sample_seq(np.random.default_rng(100 + i),
                                   args.prompt_len)
                        for i in range(B)]).astype(np.int32)
    plen = np.full((B,), args.prompt_len, np.int32)
    seeds = np.arange(B, dtype=np.int32)

    # ---- plain baseline: one-scan single-token cached greedy decode --
    def plain_decode(params, prompts_v):
        Lbuf = args.prompt_len + args.max_new
        kv = init_elm_cache(t_cfg, B, Lbuf)
        logits, kv = t_model.apply(
            {"params": params}, prompts_v, kv_cache=kv,
            cache_index=jnp.zeros((B,), jnp.int32))
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), -1)

        def body(carry, i):
            kv, tok = carry
            lg, kv = t_model.apply(
                {"params": params}, tok[:, None].astype(jnp.int32),
                kv_cache=kv,
                cache_index=jnp.full((B,), args.prompt_len, jnp.int32)
                + i)
            nxt = jnp.argmax(lg[:, 0].astype(jnp.float32), -1)
            return (kv, nxt), tok

        (_, last), toks = jax.lax.scan(
            body, (kv, tok), jnp.arange(args.max_new - 1))
        return jnp.concatenate([toks.T, last[:, None]], 1)

    plain = jax.jit(plain_decode)

    def timed(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # barrier
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        return out, min(ts)

    out_plain, dt = timed(plain, t_params, jnp.asarray(prompts))
    base_rate = B * args.max_new / dt
    print(json.dumps({"variant": "plain", "gamma": 0,
                      "tok_per_s": round(base_rate, 1),
                      "sec": round(dt, 3), "accept_rate": 1.0,
                      "speedup": 1.0}), flush=True)
    ref = np.asarray(out_plain)

    for gamma in (int(g) for g in args.gammas.split(",")):
        dec = elm_spec_decoder(t_model, t_cfg, d_model, d_cfg,
                               gamma=gamma, temperature=0.0)
        fn = jax.jit(partial(dec, max_new=args.max_new))
        res, dt = timed(fn, t_params, d_params, jnp.asarray(prompts),
                        jnp.asarray(plen), jnp.asarray(seeds))
        toks = np.asarray(res.tokens)[:, args.prompt_len:
                                      args.prompt_len + args.max_new]
        lossless = bool((toks == ref).all())
        acc = float(np.asarray(res.accepted)) / max(
            float(np.asarray(res.drafted)), 1.0)
        rate = B * args.max_new / dt
        print(json.dumps({"variant": "speculative", "gamma": gamma,
                          "tok_per_s": round(rate, 1),
                          "sec": round(dt, 3),
                          "accept_rate": round(acc, 3),
                          "rounds": int(np.asarray(res.rounds)),
                          "lossless_vs_plain": lossless,
                          "speedup": round(rate / base_rate, 2)}),
              flush=True)

    # ---- draft-FREE prompt lookup (serving/speculative.py) ----------
    # the Markov task's dominant transitions repeat constantly, so
    # n-gram self-continuation should accept well — measures the
    # zero-extra-weights speculation mode
    from unidisc_tpu.serving.speculative import elm_lookup_decoder
    for gamma in (int(g) for g in args.gammas.split(",")):
        dec = elm_lookup_decoder(t_model, t_cfg, gamma=gamma, ngram=2)
        fn = jax.jit(partial(dec, max_new=args.max_new))
        res, dt = timed(fn, t_params, jnp.asarray(prompts),
                        jnp.asarray(plen), jnp.asarray(seeds))
        toks = np.asarray(res.tokens)[:, args.prompt_len:
                                      args.prompt_len + args.max_new]
        lossless = bool((toks == ref).all())
        acc = float(np.asarray(res.accepted)) / max(
            float(np.asarray(res.drafted)), 1.0)
        rate = B * args.max_new / dt
        print(json.dumps({"variant": "lookup", "gamma": gamma,
                          "tok_per_s": round(rate, 1),
                          "sec": round(dt, 3),
                          "accept_rate": round(acc, 3),
                          "rounds": int(np.asarray(res.rounds)),
                          "lossless_vs_plain": lossless,
                          "speedup": round(rate / base_rate, 2)}),
              flush=True)

    # ---- serving path: continuous batcher with/without spec rounds ---
    from unidisc_tpu.serving.continuous import elm_continuous_batcher

    def serve_cell(tag, draft_arg, gamma):
        bat = elm_continuous_batcher(
            t_model, t_params, t_cfg, slots=B, chunk=8,
            draft=draft_arg, gamma=gamma)
        try:
            # warmup (compiles insert + decode)
            bat.submit(prompts[0].tolist(),
                       max_new_tokens=8).result(timeout=1200)
            t0 = time.perf_counter()
            futs = [bat.submit(prompts[i].tolist(),
                               max_new_tokens=args.max_new)
                    for i in range(B)]
            tok_counts = [len(f.result(timeout=1200)["tokens"])
                          for f in futs]
            dt = time.perf_counter() - t0
            rate = sum(tok_counts) / dt
            print(json.dumps({"variant": tag, "gamma": gamma,
                              "tok_per_s": round(rate, 1),
                              "sec": round(dt, 3)}), flush=True)
        finally:
            bat.shutdown()

    serve_cell("continuous_plain", None, 0)
    for gamma in (int(g) for g in args.gammas.split(",")):
        serve_cell("continuous_speculative",
                   (d_model, d_cfg, d_params), gamma)


if __name__ == "__main__":
    main()
