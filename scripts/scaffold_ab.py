"""Scaffold decoding A/B: per-step MODEL-SIZE scheduling (ROADMAP #3 /
round-3 VERDICT #8 — the next NFE lever after dilation).

Idea: denoise steps differ in how much they need the full model — run
part of the maskgit schedule on a SMALL trunk and the rest on the full
model, inside one jitted scan. TPU-native realization: the two models
share vocab/length, `params = (params_small, params_big)`, and a single
forward closure dispatches with `lax.cond` on sigma (monotone in t), so
the EXISTING scan sampler runs unchanged — no host round-trips, one
compiled program per split.

Harness (same protocol as scripts/nfe_quality_ab.py): train both models
on the deterministic synthetic t2i task, sweep the split point in both
orders (small-early/big-late and big-early/small-late), score each cell
by exact-token accuracy vs ground truth + NELBO under the BIG model, and
report compute cost in big-model-step equivalents
(cost = s_small * C_small/C_big + s_big).

Run: python scripts/scaffold_ab.py [--train-steps 3000] [--scenes 256]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--scenes", type=int, default=256)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--big", default="1024x24x16",
                    help="big model as HIDDENxBLOCKSxHEADS")
    ap.add_argument("--small", default="256x6x4")
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

    # deterministic dataset: caption -> image tokens, DEDUPED by caption
    # and position-complete (_render_scene_pos) so the conditional target
    # is a FUNCTION — the original _render_scene omits position and only
    # ~90 captions exist, making exact-match accuracy ill-posed
    rng = np.random.default_rng(0)
    scenes = []
    seen = set()
    attempts = 0
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

    model_s, params_s, n_s = train(cfg_small, "small")
    model_b, params_b, n_b = train(cfg_big, "big")
    cost_ratio = n_s / n_b  # per-step FLOPs ratio (same L, 6NL scaling)

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

    # sigma threshold for the split: timesteps are linspace(1, eps, N+1);
    # step i runs at t_i — phase A covers steps [0, split)
    from unidisc_tpu.diffusion.noise import get_noise
    noise = get_noise(cfg_big.noise)
    timesteps = np.linspace(1.0, cfg_big.sampling.sampling_eps,
                            args.steps + 1)

    def scaffold_forward(split, small_first):
        """One forward closure dispatching on sigma: steps [0, split)
        run the phase-A model, the rest phase B."""
        t_boundary = timesteps[split] if split < args.steps else -1.0
        sig_b = float(np.asarray(noise.total(jnp.asarray(
            max(t_boundary, 1e-6)))))

        def forward(params, x, sigma, mod):
            pa, pb = params
            early = sigma[0] > sig_b + 1e-8
            fa = fwd_s if small_first else fwd_b
            fb = fwd_b if small_first else fwd_s
            p_early = pa if small_first else pb
            p_late = pb if small_first else pa
            return jax.lax.cond(
                early,
                lambda _: fa(p_early, x, sigma, mod),
                lambda _: fb(p_late, x, sigma, mod), None)
        return forward

    for small_first in (True, False):
        for split in (0, args.steps // 4, args.steps // 2,
                      3 * args.steps // 4, args.steps):
            forward = scaffold_forward(split, small_first)
            sample = jax.jit(build_sampler(forward, cfg_big))
            out = sample((params_s, params_b), jax.random.PRNGKey(5),
                         jnp.asarray(x0), jnp.asarray(unmask),
                         jnp.asarray(modality))
            toks = np.asarray(out.tokens)
            img_pred = toks[:, TXT:] - cfg_big.model.text_vocab_size
            acc = float((img_pred == gt).mean())
            nll = float(np.mean(np.asarray(sequence_nll(
                cfg_big, big_apply, params_b,
                {"input_ids": jnp.asarray(toks),
                 "modality": jnp.asarray(modality)},
                jax.random.PRNGKey(6), n_timesteps=4))))
            n_small = split if small_first else args.steps - split
            n_big = args.steps - n_small
            cost = n_small * cost_ratio + n_big
            print(json.dumps({
                "small_first": small_first, "split": split,
                "small_steps": n_small, "big_steps": n_big,
                "cost_big_step_equiv": round(cost, 2),
                "token_acc_vs_truth": round(acc, 4),
                "nll_under_big": round(nll, 4)}), flush=True)


if __name__ == "__main__":
    main()
