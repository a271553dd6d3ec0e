"""Distilled-scaffold A/B: does KL distillation (training/distill.py)
produce a better LATE-step scaffold trunk than training the small model
from scratch on the task?

This is the production-gate experiment for scaffold decoding
(BASELINE.md): the measured 97%-accuracy-at-26%-compute result used a
small trunk trained on the task directly; a deployment only has the big
model + data, so the small trunk must be distilled. Protocol (same
position-complete synthetic t2i task as scripts/scaffold_ab.py /
nfe_quality_ab.py):

1. train BIG on the task,
2. train SMALL-scratch on the task (upper-bound control),
3. distill SMALL-distilled from the frozen big teacher — t window
   restricted to the late-step region it will serve
   (distill_t_max(cfg, split)), optional --hard-weight anchor,
4. score pure-big / pure-small(each) / big-early+small-late(each) at
   the split: exact-token accuracy vs ground truth + NELBO under big.

Run: python scripts/distill_scaffold.py [--train-steps 3000]
     [--distill-steps 3000] [--split 8] [--cpu]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--distill-steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--scenes", type=int, default=256)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--split", type=int, default=8)
    ap.add_argument("--big", default="1024x24x16")
    ap.add_argument("--small", default="256x6x4")
    ap.add_argument("--hard-weight", type=float, default=0.0)
    ap.add_argument("--distill-lr", type=float, default=3e-4)
    ap.add_argument("--full-window", action="store_true",
                    help="distill over the full t range instead of the "
                    "late-step window")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from unidisc_tpu.config import Config
    from unidisc_tpu.eval.harness import sequence_nll
    from unidisc_tpu.eval.scoring import _render_scene_pos
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.sampling.sampler import build_sampler
    from unidisc_tpu.tokenizers.image_codecs import get_codec
    from unidisc_tpu.tokenizers.text import get_tokenizer
    from unidisc_tpu.training.distill import (distill_t_max,
                                              make_distill_step)
    from unidisc_tpu.training.train_state import (compute_batch_loss,
                                                  init_train_state,
                                                  make_apply_fn,
                                                  make_optimizer)

    TXT, GRID = 32, 8
    IMG = GRID * GRID
    codec = get_codec("dummy", image_size=GRID * 16, vocab=256)
    tok = get_tokenizer("byte")

    def make_cfg(hidden, blocks, heads):
        return Config.make("tiny").override(**{
            "model.length": TXT + IMG, "model.txt_length": TXT,
            "model.img_length": IMG, "model.text_vocab_size": 261,
            "model.image_vocab_size": 256, "model.hidden_size": hidden,
            "model.n_blocks": blocks, "model.n_heads": heads,
            "model.dropout": 0.0, "model.cond_dim": 256,
            "model.force_argmax_valid_indices": True,
            "trainer.lr": 3e-4, "trainer.warmup_steps": 20,
            "sampling.predictor": "maskgit", "sampling.cfg": None,
            "sampling.steps": args.steps})

    cfg_small = make_cfg(*(int(x) for x in args.small.split("x")))
    cfg_big = make_cfg(*(int(x) for x in args.big.split("x")))

    rng = np.random.default_rng(0)
    scenes, seen, attempts = [], set(), 0
    while len(scenes) < args.scenes and attempts < 100 * args.scenes:
        attempts += 1
        img, cap = _render_scene_pos(rng, GRID * 16)
        if cap in seen:
            continue
        seen.add(cap)
        ids = np.asarray(codec.encode(codec.params,
                                      jnp.asarray(img[None])))[0]
        txt = tok(cap, max_length=TXT)["input_ids"][0]
        scenes.append((txt, ids, cap))
    truth = {cap: ids for txt, ids, cap in scenes}

    def batch_of(idx, cfg):
        txts = np.stack([scenes[i][0] for i in idx])
        imgs = np.stack([scenes[i][1] for i in idx]) + \
            cfg.model.text_vocab_size
        ids = np.concatenate([txts, imgs], -1).astype(np.int32)
        modality = np.concatenate([np.zeros_like(txts),
                                   np.ones_like(imgs)], -1)
        return {"input_ids": jnp.asarray(ids),
                "modality": jnp.asarray(modality, jnp.int32)}

    def train(cfg, tag):
        model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
        n = sum(int(np.prod(p.shape))
                for p in jax.tree_util.tree_leaves(params))
        print(f"# {tag}: {n/1e6:.1f}M params", file=sys.stderr, flush=True)
        opt = make_optimizer(cfg)
        state = init_train_state(cfg, params)
        apply_fn = make_apply_fn(cfg, model)

        @jax.jit
        def step(state, batch, rng):
            def loss_fn(p):
                return compute_batch_loss(cfg, apply_fn, p, rng,
                                          batch).loss
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = opt.update(grads, state.opt_state,
                                            state.params)
            return state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state), loss

        key = jax.random.PRNGKey(1)
        for i in range(args.train_steps):
            key, k1, k2 = jax.random.split(key, 3)
            idx = jax.random.randint(k1, (args.batch,), 0, len(scenes))
            state, loss = step(state, batch_of(np.asarray(idx), cfg), k2)
            if i % 500 == 0:
                print(f"# {tag} step {i} loss {float(loss):.4f}",
                      file=sys.stderr, flush=True)
        return model, state.params, n

    model_b, params_b, n_b = train(cfg_big, "big")
    model_s, params_scratch, n_s = train(cfg_small, "small-scratch")
    cost_ratio = n_s / n_b

    # --- distill the small trunk from the frozen big teacher ----------
    def teacher_apply(p, x, sigma, modality):
        return model_b.apply({"params": p}, x, sigma, modality=modality)

    t_max = None if args.full_window else \
        distill_t_max(cfg_big, args.split)
    d_cfg = cfg_small.override(**{"trainer.lr": args.distill_lr})
    _, params_d0 = init_dit(jax.random.PRNGKey(7), cfg_small.model)
    dstep = jax.jit(make_distill_step(
        d_cfg, model_s, teacher_apply, t_max=t_max,
        hard_weight=args.hard_weight))
    dstate = init_train_state(d_cfg, params_d0)
    key = jax.random.PRNGKey(8)
    for i in range(args.distill_steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (args.batch,), 0, len(scenes))
        dstate, dm = dstep(dstate, params_b,
                           batch_of(np.asarray(idx), cfg_small), k2)
        if i % 500 == 0:
            print(f"# distill step {i} kl {float(dm.kl):.4f} "
                  f"hard {float(dm.hard_loss):.4f}",
                  file=sys.stderr, flush=True)
    params_distilled = dstate.ema_params
    print(f"# distill window t_max={t_max} final kl {float(dm.kl):.4f}",
          file=sys.stderr, flush=True)

    # --- evaluation ----------------------------------------------------
    eval_caps = list(truth)[: args.eval_batch]
    txts = np.stack([tok(c, max_length=TXT)["input_ids"][0]
                     for c in eval_caps]).astype(np.int32)
    gt = np.stack([truth[c] for c in eval_caps])
    B = len(eval_caps)
    x0 = np.concatenate(
        [txts, np.zeros((B, IMG), np.int32)], -1).astype(np.int32)
    unmask = np.zeros((B, TXT + IMG), bool)
    unmask[:, :TXT] = True
    modality = np.concatenate(
        [np.zeros_like(txts), np.ones((B, IMG), np.int32)], -1)

    def fwd(model):
        def f(p, x, sigma, mod):
            return model.apply({"params": p}, x, sigma, modality=mod)
        return f

    fwd_s, fwd_b = fwd(model_s), fwd(model_b)
    big_apply = lambda p, x, s, m: model_b.apply({"params": p}, x, s,
                                                 modality=m)

    def scaffold_forward(split):
        """big-early / small-late (the measured-good ordering) — the
        PRODUCTION dispatch, imported so the A/B can't drift from it."""
        from unidisc_tpu.sampling.scaffold import build_scaffold_forward
        return build_scaffold_forward(fwd_b, fwd_s, cfg_big, split=split,
                                      num_steps=args.steps)

    def score(tag, forward, params, n_small):
        sample = jax.jit(build_sampler(forward, cfg_big))
        out = sample(params, jax.random.PRNGKey(5), jnp.asarray(x0),
                     jnp.asarray(unmask), jnp.asarray(modality))
        toks = np.asarray(out.tokens)
        img_pred = toks[:, TXT:] - cfg_big.model.text_vocab_size
        acc = float((img_pred == gt).mean())
        nll = float(np.mean(np.asarray(sequence_nll(
            cfg_big, big_apply, params_b,
            {"input_ids": jnp.asarray(toks),
             "modality": jnp.asarray(modality)},
            jax.random.PRNGKey(6), n_timesteps=4))))
        n_big = args.steps - n_small
        print(json.dumps({
            "variant": tag, "split": args.split,
            "small_steps": n_small, "big_steps": n_big,
            "cost_big_step_equiv": round(
                n_small * cost_ratio + n_big, 2),
            "token_acc_vs_truth": round(acc, 4),
            "nll_under_big": round(nll, 4)}), flush=True)

    sp = args.split
    wrap = lambda f: lambda p, x, s, m: f(p[0], x, s, m)
    score("pure_big", wrap(fwd_b), (params_b,), 0)
    score("pure_small_scratch", wrap(fwd_s), (params_scratch,),
          args.steps)
    score("pure_small_distilled", wrap(fwd_s), (params_distilled,),
          args.steps)
    score("scaffold_scratch", scaffold_forward(sp),
          (params_b, params_scratch), args.steps - sp)
    score("scaffold_distilled", scaffold_forward(sp),
          (params_b, params_distilled), args.steps - sp)


if __name__ == "__main__":
    main()
