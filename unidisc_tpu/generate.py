"""Generation CLI: sample from a trained checkpoint.

Counterpart of the reference's `mode=eval` generation path
(reference: main.py generate_samples / model_eval.py generation loop).

Usage:
  python -m unidisc_tpu.generate --ckpt runs/dev --n 16 --out samples/ \
      [--prompt "a red car"] [--task gen_image|gen_text|joint|infill] \
      [--steps 64] [--codec lfq --image-size 64] [--use-ema]
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", required=True, help="run dir")
    parser.add_argument("--out", default="samples")
    parser.add_argument("--n", type=int, default=8)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--prompt", default=None)
    parser.add_argument("--task", default="auto")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--codec", default=None,
                        help="decode images (e.g. lfq, llamagen-vq16)")
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--quantize", default=None, choices=[None, "int8"],
                        help="int8 W8A8 inference (~1.4x on v5e)")
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.models.dit import init_dit
    from unidisc_tpu.serving.engine import InferenceEngine
    from unidisc_tpu.tokenizers.text import get_tokenizer
    from unidisc_tpu.training.checkpoint import CheckpointManager
    from unidisc_tpu.training.train_state import init_train_state

    mgr = CheckpointManager(f"{args.ckpt}/checkpoints")
    step = mgr.latest_step()
    assert step is not None, f"no checkpoints under {args.ckpt}"
    # config snapshot rides in the checkpoint (reference:
    # save_config_to_ckpt main.py:460-468)
    import orbax.checkpoint as ocp
    meta = mgr._mgr.restore(step, args=ocp.args.Composite(
        meta=ocp.args.JsonRestore()))["meta"]
    config = Config.from_json(json.dumps(meta["config"]))
    if args.steps:
        config = config.override(**{"sampling.steps": args.steps})

    model, params = init_dit(jax.random.PRNGKey(config.seed), config.model)
    state, _ = mgr.restore(init_train_state(config, params))
    params = state.ema_params if args.use_ema else state.params
    print(f"[generate] restored step {step} "
          f"({'EMA' if args.use_ema else 'live'} params)")
    if args.quantize:
        from unidisc_tpu.ops.quant import quantize_model
        config, model, params = quantize_model(config, params)
        print(f"[generate] int8 W8A8 inference enabled")

    codec = None
    if args.codec:
        from unidisc_tpu.tokenizers.image_codecs import get_codec
        codec = get_codec(args.codec, image_size=args.image_size)

    engine = InferenceEngine(config, model, params,
                             tokenizer=get_tokenizer("byte"), codec=codec)
    os.makedirs(args.out, exist_ok=True)

    done = 0
    batch_idx = 0
    while done < args.n:
        b = min(args.batch, args.n - done)
        out = engine.run(text=args.prompt, task=args.task, batch=b,
                         seed=args.seed + batch_idx)
        for i, text in enumerate(out["texts"][:b]):
            rec = {"index": done + i, "text": text, "nfe": out["nfe"]}
            with open(f"{args.out}/samples.jsonl", "a") as f:
                f.write(json.dumps(rec) + "\n")
        if "images_b64" in out:
            import base64
            for i, b64 in enumerate(out["images_b64"][:b]):
                with open(f"{args.out}/sample_{done + i:04d}.png",
                          "wb") as f:
                    f.write(base64.b64decode(b64))
        done += b
        batch_idx += 1
    print(f"[generate] wrote {done} samples to {args.out}/ "
          f"(nfe {out['nfe']}/sample)")


if __name__ == "__main__":
    main()
