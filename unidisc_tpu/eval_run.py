"""Evaluation CLI: metrics battery from a trained checkpoint.

Counterpart of the reference's `mode=eval` (reference: model.py:1187
validate + on_validation_epoch_end battery): val NLL/BPD/PPL per modality,
speed eval (times.txt metrics), token entropy of generations, and FID
against a data reference when a codec is given.

Usage:
  python -m unidisc_tpu.eval_run --ckpt runs/dev --data /data/shards/s0 \
      [--codec lfq --image-size 64] [--max-batches 16] [--use-ema]
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--data", default=None,
                        help="token shard dir for val metrics")
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--max-batches", type=int, default=16)
    parser.add_argument("--gen-batches", type=int, default=2)
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--codec", default=None)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--fid-ref", default=None,
                        help=".npy of reference images (N,H,W,3) for FID")
    parser.add_argument("--mauve-ref", default=None,
                        help="text file of reference texts (one per line)")
    parser.add_argument("--clip", action="store_true",
                        help="CLIP score of generated images vs their "
                             "prompts (needs $UNIDISC_ASSETS)")
    parser.add_argument("--assets", default=None,
                        help="judge-asset dir (overrides $UNIDISC_ASSETS)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from unidisc_tpu.config import Config
    from unidisc_tpu.eval.harness import speed_eval, token_entropy
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.sampling.sampler import build_sampler
    from unidisc_tpu.training.checkpoint import CheckpointManager
    from unidisc_tpu.training.train_state import (init_train_state,
                                                  make_eval_step)
    from unidisc_tpu.training.trainer import LN2

    mgr = CheckpointManager(f"{args.ckpt}/checkpoints")
    step = mgr.latest_step()
    assert step is not None, f"no checkpoints under {args.ckpt}"
    meta = mgr._mgr.restore(step, args=ocp.args.Composite(
        meta=ocp.args.JsonRestore()))["meta"]
    config = Config.from_json(json.dumps(meta["config"]))
    if args.steps:
        config = config.override(**{"sampling.steps": args.steps})
    m = config.model

    model, params = init_dit(jax.random.PRNGKey(config.seed), m)
    state, _ = mgr.restore(init_train_state(config, params))
    params = state.ema_params if args.use_ema else state.params
    results = {"step": int(step)}

    # ---- val metrics -----------------------------------------------------
    if args.data:
        from unidisc_tpu.data.token_shards import (TokenShardDataset,
                                                   WeightedDatasetSampler)
        loader = WeightedDatasetSampler([TokenShardDataset(args.data)],
                                        batch_size=args.batch,
                                        seed=7, shuffle=False)
        eval_step = jax.jit(make_eval_step(config, model,
                                           use_ema=False))
        sums = np.zeros(6)
        for i, batch in enumerate(loader):
            if i >= args.max_batches:
                break
            jb = {k: jnp.asarray(v) for k, v in batch.items()
                  if hasattr(v, "shape")}
            mt = jax.device_get(eval_step(
                state.replace(params=params), jb, jax.random.PRNGKey(i)))
            sums += np.asarray([mt.nll_sum, mt.token_count, mt.nll_txt_sum,
                                mt.txt_count, mt.nll_img_sum, mt.img_count],
                               np.float64)
        nll = sums[0] / max(sums[1], 1)
        results.update({
            "val/nll": nll, "val/bpd": nll / LN2,
            "val/ppl": float(np.exp(min(nll, 50))),
            "val/txt_ppl": float(np.exp(min(sums[2] / max(sums[3], 1), 50))),
            "val/img_bpd": sums[4] / max(sums[5], 1) / LN2})

    # ---- generation + speed (times.txt metrics) ---------------------------
    def forward_logits(p, x, sigma, modality):
        return model.apply({"params": p}, x, sigma, modality=modality)

    sample = jax.jit(build_sampler(forward_logits, config))
    b = args.batch
    x0 = np.zeros((b, m.length), np.int32)
    unmask = np.zeros((b, m.length), bool)
    modality = np.concatenate([np.zeros((b, m.txt_length), np.int32),
                               np.ones((b, m.img_length), np.int32)], -1)
    sargs = (params, jax.random.PRNGKey(0), jnp.asarray(x0),
             jnp.asarray(unmask), jnp.asarray(modality))
    results.update(speed_eval(lambda *a: sample(*a), sargs,
                              iters=max(args.gen_batches, 2),
                              tokens_per_sample=m.length, batch=b))

    toks = np.asarray(sample(*sargs).tokens)
    results["gen/token_entropy"] = token_entropy(toks, m.vocab_size)
    txt_share = (toks[:, :m.txt_length] < m.text_vocab_size).mean()
    results["gen/txt_vocab_respected"] = float(txt_share)

    # ---- quality judges (eval/judges.py; reference battery
    # model_eval.py:1275-1733) ------------------------------------------------
    from unidisc_tpu.eval import judges

    gen_imgs = None
    if args.codec and (args.fid_ref or args.clip):
        from unidisc_tpu.tokenizers.image_codecs import get_codec
        codec = get_codec(args.codec, image_size=args.image_size)
        img_ids = np.clip(toks[:, m.txt_length:] - m.text_vocab_size,
                          0, m.image_vocab_size - 1)
        gen_imgs = np.asarray(codec.decode(codec.params, img_ids))

    if args.fid_ref and gen_imgs is not None:
        from unidisc_tpu.eval.fid import FIDMetric
        ref_imgs = np.load(args.fid_ref)
        try:
            feat_fn = judges.inception_features(args.assets)
            dim, which = 2048, "inception"
        except FileNotFoundError:
            feat_fn = judges.random_conv_features()
            dim, which = 192, "random_conv(seed7)"
        fid = FIDMetric(feat_fn, dim)
        fid.update_real(ref_imgs)
        fid.update_fake(gen_imgs)
        results[f"fid/{which}"] = fid.compute()

    if args.mauve_ref:
        from unidisc_tpu.tokenizers.text import get_tokenizer
        tokenizer = get_tokenizer()
        gen_texts = [tokenizer.decode(r[r < m.text_vocab_size - 1])
                     for r in toks[:, :m.txt_length]]
        with open(args.mauve_ref) as f:
            ref_texts = [ln.strip() for ln in f if ln.strip()]
        feat_fn = None
        try:
            _, feat_fn = judges.judge_lm(args.assets)
            results["mauve/features"] = "gpt2-large"
        except FileNotFoundError:
            results["mauve/features"] = "bag_of_ngrams"
        results["mauve/score"] = judges.mauve_score(
            ref_texts, gen_texts, feature_fn=feat_fn)["mauve"]
        try:
            nll_fn, _ = judges.judge_lm(args.assets)
            results["gen/judge_ppl"] = float(
                np.exp(np.mean(nll_fn(gen_texts))))
        except FileNotFoundError:
            pass

    if args.clip and args.codec:
        try:
            score = judges.clip_score_fn(args.assets)
            from unidisc_tpu.tokenizers.text import get_tokenizer
            tokenizer = get_tokenizer()
            prompts = [tokenizer.decode(r[r < m.text_vocab_size - 1])
                       for r in toks[:, :m.txt_length]]
            # codec.decode emits [-1, 1] (same convention as
            # serving.engine.encode_image_b64)
            imgs = ((np.clip(gen_imgs, -1, 1) + 1) * 127.5).astype(np.uint8)
            results["clip/score"] = float(np.mean(score(imgs, prompts)))
        except FileNotFoundError as e:
            results["clip/score"] = f"skipped ({e})"

    for k, v in results.items():
        print(f"{k}: {v:.6g}" if isinstance(v, float) else f"{k}: {v}")
    with open(f"{args.ckpt}/eval_results.json", "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"[eval] wrote {args.ckpt}/eval_results.json")
    return results


if __name__ == "__main__":
    main()
