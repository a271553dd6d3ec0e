"""CFG-distillation A/B: guided teacher (2 forwards/step) vs distilled
student (1 forward/step) at matched sampling quality.

CFG doubles every sampler forward ([cond || uncond] batch,
sampling/sampler.py:197-205 — the reference pays the same,
model_eval.py:1761-1833). Guided distillation folds the combined
posterior (1+w)·cond − w·uncond into a single conditional forward
(training/distill.py guidance=), halving NFE cost on every predictor.

Protocol (same synthetic deterministic t2i task as nfe_quality_ab.py):
  1. train a teacher WITH trainer.mask_entire_modality (so the uncond
     branch is trained, as in the production recipe);
  2. verify the premise: teacher quality at sampling.cfg=w vs cfg=None —
     guidance must measurably help or this task can't show preservation;
  3. distill a student (initialized FROM the teacher) against the
     CFG-combined posterior at the serving w(t) schedule;
  4. eval the student at cfg=None (single forward) — the claim holds if
     student-acc ~ teacher-CFG-acc at half the per-step rows.

Prints one JSON line per cell. Throughput: the row-halving is measured
at the flagship scale by `--bench-flagship` (115M int8, random weights,
cfg on/off — quality-independent).

Run: python scripts/cfg_distill_ab.py [--train-steps 3000]
     [--distill-steps 1500] [--guidance 2.0] [--cpu]
"""
import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--distill-steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--guidance", type=float, default=2.0)
    ap.add_argument("--preset", default="tiny", choices=["tiny", "medium"],
                    help="medium = ~300M (h=1024, 24 blocks), the scale "
                    "gate protocol shared with nfe_quality_ab.py")
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--steps", default="8,32",
                    help="sampler step counts to eval")
    ap.add_argument("--modality-dropout", type=float, default=0.2)
    ap.add_argument("--bench-flagship", action="store_true",
                    help="also measure 115M int8 sampler tok/s with cfg "
                    "on vs off (random weights; throughput only)")
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
    from unidisc_tpu.sampling.t2i_fast import build_t2i_sampler
    from unidisc_tpu.tokenizers.image_codecs import get_codec
    from unidisc_tpu.tokenizers.text import get_tokenizer
    from unidisc_tpu.training.distill import make_distill_step
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
            # reference "medium" scale: ~300M (nfe_quality_ab.py protocol)
            {"model.hidden_size": 1024, "model.n_blocks": 24,
             "model.n_heads": 16, "model.cond_dim": 256})
    cfg = Config.make("tiny").override(**{
        "model.length": TXT + IMG, "model.txt_length": TXT,
        "model.img_length": IMG, "model.text_vocab_size": 261,
        "model.image_vocab_size": 256, "model.dropout": 0.0,
        "model.force_argmax_valid_indices": True,
        "trainer.lr": 3e-4, "trainer.warmup_steps": 20,
        "trainer.mask_entire_modality": args.modality_dropout,
        "sampling.predictor": "maskgit", "sampling.cfg": None, **arch})

    # deterministic deduped position-complete dataset (nfe_quality_ab.py)
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

    model, params = init_dit(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    state = init_train_state(cfg, params)
    train_apply = make_apply_fn(cfg, model)

    def batch_of(idx):
        txts = np.stack([scenes[i][0] for i in idx])
        imgs = np.stack([scenes[i][1] for i in idx]) + \
            cfg.model.text_vocab_size
        ids = np.concatenate([txts, imgs], -1).astype(np.int32)
        modality = np.concatenate([np.zeros_like(txts),
                                   np.ones_like(imgs)], -1)
        return {"input_ids": jnp.asarray(ids),
                "modality": jnp.asarray(modality, jnp.int32)}

    @jax.jit
    def train_step(state, batch, rng):
        def loss_fn(p):
            return compute_batch_loss(cfg, train_apply, p, rng, batch).loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        return state.replace(step=state.step + 1,
                             params=optax.apply_updates(state.params,
                                                        updates),
                             opt_state=opt_state), loss

    key = jax.random.PRNGKey(1)
    for i in range(args.train_steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (args.batch,), 0, len(scenes))
        state, loss = train_step(state, batch_of(np.asarray(idx)), k2)
        if i % 200 == 0:
            print(f"# teacher step {i} loss {float(loss):.4f}",
                  file=sys.stderr, flush=True)
    # keep ONLY the teacher weights: the optimizer moments + EMA of the
    # 303M medium teacher are ~3.6G that must be freed before the
    # distill state (another params+moments+EMA) is allocated — holding
    # both OOMs the 16G chip (measured)
    teacher_params = state.params
    del state

    eval_caps = list(truth)[:args.eval_batch]
    txts = np.stack([tok(c, max_length=TXT)["input_ids"][0]
                     for c in eval_caps]).astype(np.int32)
    gt = np.stack([truth[c] for c in eval_caps])
    apply_fn = lambda p, x, s, m: model.apply({"params": p}, x, s,
                                              modality=m)

    def eval_cell(params, scfg, extra, **skw):
        sample = jax.jit(build_t2i_sampler(model, scfg, **skw))
        out = sample(params, jax.random.PRNGKey(5), jnp.asarray(txts))
        toks = np.asarray(out.tokens)
        img_pred = toks[:, TXT:] - cfg.model.text_vocab_size
        acc = float((img_pred == gt).mean())
        modality = np.concatenate(
            [np.zeros_like(txts), np.ones((len(txts), IMG), np.int32)], -1)
        nll = float(np.mean(np.asarray(sequence_nll(
            cfg, apply_fn, params,
            {"input_ids": jnp.asarray(toks),
             "modality": jnp.asarray(modality)},
            jax.random.PRNGKey(6), n_timesteps=4))))
        print(json.dumps({**extra, "token_acc_vs_truth": round(acc, 4),
                          "model_nll": round(nll, 4),
                          "nfe": int(out.nfe)}), flush=True)

    step_list = [int(s) for s in args.steps.split(",")]
    # premise check: does guidance help the teacher on this task?
    for steps in step_list:
        eval_cell(teacher_params,
                  cfg.override(**{"sampling.steps": steps}),
                  {"cell": "teacher_nocfg", "steps": steps})
        eval_cell(teacher_params,
                  cfg.override(**{"sampling.steps": steps,
                                  "sampling.cfg": args.guidance}),
                  {"cell": f"teacher_cfg{args.guidance}", "steps": steps})

    # distill: student initialized FROM the teacher, target = combined
    # posterior at the serving w(t) schedule
    d_cfg = cfg.override(**{"trainer.lr": 1e-4,
                            "sampling.cfg": args.guidance})
    dstep = jax.jit(make_distill_step(d_cfg, model, apply_fn,
                                      guidance=args.guidance))
    dstate = init_train_state(d_cfg, teacher_params)
    key = jax.random.PRNGKey(8)
    for i in range(args.distill_steps):
        key, k1, k2 = jax.random.split(key, 3)
        idx = jax.random.randint(k1, (args.batch,), 0, len(scenes))
        dstate, dm = dstep(dstate, teacher_params,
                           batch_of(np.asarray(idx)), k2)
        if i % 200 == 0:
            print(f"# distill step {i} kl {float(dm.kl):.4f}",
                  file=sys.stderr, flush=True)

    for steps in step_list:
        eval_cell(dstate.ema_params,
                  cfg.override(**{"sampling.steps": steps}),
                  {"cell": "student_distilled_nocfg", "steps": steps})

    # COMPOSED stack gate: the full `distilled_stack` serving overlay
    # (no-CFG student + frozen text K/V + 8-NFE dilated schedule) vs
    # the guided 32-step teacher — the levers are gated individually
    # elsewhere; this cell checks they don't interact destructively.
    stack_cfg = cfg.override(**{"sampling.steps": 8,
                                "sampling.maskgit_dilation": 2})
    eval_cell(dstate.ema_params, stack_cfg,
              {"cell": "student_distilled_stack", "steps": 8,
               "dilation": 2, "frozen": True}, cached_cond=True)

    if args.bench_flagship:
        import time

        from __graft_entry__ import _flagship_config
        from unidisc_tpu.ops.quant import quantize_model
        # the headline bench's exact config (32-step maskgit, int8,
        # bf16 logits) so the cfg_on cell reproduces bench.py and the
        # cfg_off delta is the single-forward saving
        fcfg = _flagship_config().override(**{
            "sampling.predictor": "maskgit", "sampling.steps": 32,
            "sampling.cfg": args.guidance,
            "model.logits_dtype": "bfloat16"})
        fmodel, fparams = init_dit(jax.random.PRNGKey(0), fcfg.model)
        qcfg, qmodel, qparams = quantize_model(fcfg, fparams)
        B = 8
        ftxts = np.zeros((B, fcfg.model.txt_length), np.int32)
        cells = (("cfg_on", qcfg, {}),
                 ("cfg_off", qcfg.override(**{"sampling.cfg": None}), {}),
                 ("cfg_off_frozen", qcfg.override(
                     **{"sampling.cfg": None}), {"cached_cond": True}))
        for label, scfg, skw in cells:
            sample = jax.jit(build_t2i_sampler(qmodel, scfg, **skw))
            out = sample(qparams, jax.random.PRNGKey(3),
                         jnp.asarray(ftxts))
            np.asarray(out.tokens)  # compile barrier
            times = []
            for w in range(3):
                t0 = time.perf_counter()
                out = sample(qparams, jax.random.fold_in(
                    jax.random.PRNGKey(4), w), jnp.asarray(ftxts))
                np.asarray(out.tokens)
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(json.dumps({
                "cell": f"flagship_{label}", "batch": B,
                "s_per_batch": round(dt, 4),
                "tok_per_s": round(B * fcfg.model.img_length / dt, 1)}),
                flush=True)


if __name__ == "__main__":
    main()
