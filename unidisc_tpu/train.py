"""Training CLI: `python -m unidisc_tpu.train model=tiny trainer.max_steps=100`.

Replaces the reference's Hydra entry point (reference: main.py:906-1134):
key=value args are dotted-path overrides onto the frozen-dataclass Config,
`model=<preset>` selects a size preset (reference: configs/model/*.yaml).
"""

from __future__ import annotations

import argparse
import ast
import sys

from unidisc_tpu.config import MODEL_PRESETS, Config


def parse_overrides(argv):
    model = "small"
    overrides = {}
    for arg in argv:
        if "=" not in arg:
            raise SystemExit(f"expected key=value, got {arg!r}")
        key, val = arg.split("=", 1)
        if key == "model" and val in MODEL_PRESETS:
            model = val
            continue
        try:
            overrides[key] = ast.literal_eval(val)
        except (ValueError, SyntaxError):
            overrides[key] = val
    return model, overrides


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="unidisc_tpu trainer",
        usage="python -m unidisc_tpu.train [--run-dir DIR] [key=value ...]")
    parser.add_argument("--run-dir", default="runs/dev")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--val-every", type=int, default=0)
    parser.add_argument("--ckpt-every", type=int, default=1000)
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--data", default=None,
                        help="comma-separated token-shard dirs; default "
                             "synthetic data")
    parser.add_argument("--stream", action="store_true",
                        help="sequential shard streaming with mid-epoch "
                             "resume (shard-*.npz / ishard-*.npz dirs)")
    parser.add_argument("--overfit", action="store_true",
                        help="overfit the first batch (loss-down smoke; "
                             "reference trainer.overfit_on_first_batch)")
    parser.add_argument("--print-hashes", action="store_true",
                        help="print param hash at start (determinism check)")
    parser.add_argument("--iterate-data-only", type=int, default=0,
                        help="iterate N dataloader batches without the "
                             "model (reference trainer.iterate_dataloader_"
                             "only)")
    args, rest = parser.parse_known_args(argv)

    model, overrides = parse_overrides(rest)
    config = Config.make(model, **overrides).validate()

    import jax

    from unidisc_tpu.utils.dist import enable_compile_cache, initialize
    initialize()
    enable_compile_cache()
    batch = args.batch_size or max(
        config.trainer.global_batch_size // max(jax.device_count(), 1), 1)
    batch_global = batch  # single-host: global == local

    from unidisc_tpu.training.trainer import Trainer

    if args.data and args.stream:
        # webdataset-style sequential shard streaming with exact mid-epoch
        # resume (the loader's counters ride the checkpoint meta)
        from unidisc_tpu.data.streaming import StreamingShardReader
        mk = lambda seed: StreamingShardReader(  # noqa: E731
            args.data, batch_size=batch_global, seed=seed,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            pack_length=(config.model.length
                         if config.trainer.interleaved else None),
            eos_id=2 if config.trainer.interleaved else None)
        train_loader = mk(config.seed)
        val_loader = mk(config.seed + 777)
    elif args.data:
        from unidisc_tpu.data.token_shards import (TokenShardDataset,
                                                   WeightedDatasetSampler)
        dsets = [TokenShardDataset(d) for d in args.data.split(",")]
        # config/data consistency (shape mismatches otherwise train silently
        # on the data's layout)
        meta = dsets[0].meta
        if meta.get("length") and meta["length"] != config.model.length:
            print(f"[train] WARNING: model.length={config.model.length} but "
                  f"shard rows are {meta['length']} tokens; the model trains "
                  f"on the shard layout. Set model.length/txt_length/"
                  f"img_length to match.")
        weights = config.data.dataset_weights
        train_loader = WeightedDatasetSampler(dsets, weights,
                                              batch_size=batch_global,
                                              seed=config.seed)
        val_loader = WeightedDatasetSampler(dsets, weights,
                                            batch_size=batch_global,
                                            seed=config.seed + 777,
                                            shuffle=False)
    else:
        from unidisc_tpu.data.synthetic import SyntheticDataLoader
        train_loader = SyntheticDataLoader(config, batch_global,
                                           seed=config.seed)
        val_loader = SyntheticDataLoader(config, batch_global,
                                         seed=config.seed + 777)

    if args.iterate_data_only:
        import time as _t
        t0 = _t.time()
        n_tok = 0
        for i, b in enumerate(train_loader):
            if i >= args.iterate_data_only:
                break
            n_tok += b["input_ids"].size
        dt = _t.time() - t0
        print(f"[train] data-only: {args.iterate_data_only} batches, "
              f"{n_tok/dt/1e6:.2f}M tok/s host-side")
        return {"step": 0}

    trainer = Trainer(config, args.run_dir, use_wandb=args.wandb,
                      log_every=args.log_every, val_every=args.val_every,
                      ckpt_every=args.ckpt_every)
    print(f"[train] model={model} params={trainer.n_params/1e6:.1f}M "
          f"devices={jax.device_count()} batch={batch_global} "
          f"mesh={dict(trainer.mesh.shape)}")
    result = trainer.fit(train_loader, val_loader,
                         overfit_first_batch=args.overfit,
                         print_hashes=args.print_hashes)
    print(f"[train] done at step {result['step']}: "
          f"loss={result.get('loss', float('nan')):.4f}")
    trainer.close()
    return result


if __name__ == "__main__":
    main()
