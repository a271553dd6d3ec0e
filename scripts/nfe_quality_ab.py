"""NFE-vs-quality A/B: dilated vs plain maskgit schedules at equal model.

ROADMAP #9 / PAPERS.md leads ("Plan for Speed" dilated scheduling): fewer
denoise steps at equal quality is the cheapest throughput lever. This
harness makes the claim measurable without external judges:

  1. overfit a small DIT on a deterministic synthetic t2i task (procedural
     shape scenes through the hash codec — the caption tokens determine
     the image tokens, so the mapping is learnable);
  2. sample with steps in {4, 8, 16, 32}, dilation in {0 (off), 2, 4};
  3. score each setting with (a) model NELBO of the samples (likelihood
     under the same model — biased toward self-samples but comparable
     ACROSS schedules at fixed model) and (b) exact-token accuracy vs the
     dataset's ground-truth image for each caption (available because the
     task is deterministic).

Prints one JSON line per (steps, dilation) cell.

Round 3 (VERDICT #2): the A/B must carry quality evidence AT SCALE, not
just the 115M-class synthetic run — `--preset medium` trains a ~300M
model (h=1024, 24 blocks, the reference's "medium" scale) on a larger
scene set; `--scenes` controls task size.

Run: python scripts/nfe_quality_ab.py [--train-steps 400]
     [--preset tiny|medium] [--scenes 64] [--cpu]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--preset", default="tiny", choices=["tiny", "medium"])
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (default: whatever platform is up)")
    ap.add_argument("--mode", default="dilation",
                    choices=["dilation", "cached"],
                    help="dilation: the NFE/dilation sweep; cached: "
                    "conditioning-frozen (cached text K/V) vs plain A/B "
                    "at the same trained model")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.eval.scoring import _render_scene_pos
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
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
    arch = ({"model.hidden_size": 256, "model.n_blocks": 6,
             "model.n_heads": 4}
            if args.preset == "tiny" else
            # reference "medium" scale: ~300M (h=1024, 24 blocks)
            {"model.hidden_size": 1024, "model.n_blocks": 24,
             "model.n_heads": 16, "model.cond_dim": 256})
    cfg = Config.make("tiny").override(**{
        "model.length": TXT + IMG, "model.txt_length": TXT,
        "model.img_length": IMG, "model.text_vocab_size": 261,
        "model.image_vocab_size": 256, "model.dropout": 0.0,
        "model.force_argmax_valid_indices": True,
        "trainer.lr": 3e-4, "trainer.warmup_steps": 20,
        "sampling.predictor": "maskgit", "sampling.cfg": None, **arch})

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

    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    print(f"# preset={args.preset} params={n_params/1e6:.1f}M "
          f"scenes={args.scenes}", file=sys.stderr, flush=True)
    opt = make_optimizer(cfg)
    state = init_train_state(cfg, params)

    def batch_of(idx):
        txts = np.stack([scenes[i][0] for i in idx])
        imgs = np.stack([scenes[i][1] for i in idx]) + \
            cfg.model.text_vocab_size
        ids = np.concatenate([txts, imgs], -1).astype(np.int32)
        modality = np.concatenate([np.zeros_like(txts),
                                   np.ones_like(imgs)], -1)
        return {"input_ids": jnp.asarray(ids),
                "modality": jnp.asarray(modality, jnp.int32)}

    train_apply = make_apply_fn(cfg, model)

    @jax.jit
    def train_step(state, batch, rng):
        def loss_fn(p):
            out = compute_batch_loss(cfg, train_apply, p, rng, batch)
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), loss

    key = jax.random.PRNGKey(1)
    for i in range(args.train_steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (args.batch,), 0, len(scenes))
        state, loss = train_step(state, batch_of(np.asarray(idx)), k2)
        if i % 100 == 0:
            print(f"# train step {i} loss {float(loss):.4f}",
                  file=sys.stderr, flush=True)

    # eval grid
    eval_caps = list(truth)[:args.eval_batch]
    txts = np.stack([tok(c, max_length=TXT)["input_ids"][0]
                     for c in eval_caps]).astype(np.int32)
    gt = np.stack([truth[c] for c in eval_caps])

    from unidisc_tpu.eval.harness import sequence_nll
    apply_fn = lambda p, x, s, m: model.apply({"params": p}, x, s,
                                              modality=m)

    def eval_cell(sample, extra):
        out = sample(state.params, jax.random.PRNGKey(5),
                     jnp.asarray(txts))
        toks = np.asarray(out.tokens)
        img_pred = toks[:, TXT:] - cfg.model.text_vocab_size
        acc = float((img_pred == gt).mean())
        modality = np.concatenate(
            [np.zeros_like(txts), np.ones((len(txts), IMG), np.int32)],
            -1)
        nll = float(np.mean(np.asarray(sequence_nll(
            cfg, apply_fn, state.params,
            {"input_ids": jnp.asarray(toks),
             "modality": jnp.asarray(modality)},
            jax.random.PRNGKey(6), n_timesteps=4))))
        print(json.dumps({**extra,
                          "token_acc_vs_truth": round(acc, 4),
                          "model_nll": round(nll, 4),
                          "nfe": int(out.nfe)}), flush=True)

    if args.mode == "dilation":
        for dilation in (0, 2, 4):
            for steps in (4, 8, 16, 32):
                scfg = cfg.override(**{
                    "sampling.steps": steps,
                    "sampling.maskgit_dilation": dilation})
                sample = jax.jit(build_t2i_sampler(model, scfg))
                eval_cell(sample, {"steps": steps, "dilation": dilation})
    else:
        # conditioning-frozen A/B: same trained model, cached text K/V
        # (image-rows-only steps) vs the plain full-forward sampler
        for cached, refresh in ((False, 0), (True, 8), (True, 0)):
            for steps in (8, 32):
                scfg = cfg.override(**{"sampling.steps": steps})
                sample = jax.jit(build_t2i_sampler(
                    model, scfg, cached_cond=cached, cond_refresh=refresh))
                eval_cell(sample, {"steps": steps, "cached": cached,
                                   "cond_refresh": refresh})


if __name__ == "__main__":
    main()
