"""Worker for the multi-host simulation test (tests/test_multihost.py).

Launched twice (process_id 0/1) with 2 local CPU devices each -> a real
4-device, 2-process JAX runtime (gloo collectives). Exercises the actual
multi-host code paths the single-host suite can't reach:

  * utils/dist.host_batch_to_global — per-host local batch slices
    assembled into one global sharded array
  * Trainer.fit + Trainer.validate under jax.process_count() == 2
  * cross-host determinism: param hash and val metrics must agree

Writes a JSON result file per process for the test to compare.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_platforms", "cpu")


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    run_dir = sys.argv[4]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    import numpy as np

    from unidisc_tpu.config import Config
    from unidisc_tpu.training.trainer import Trainer
    from unidisc_tpu.utils.dist import (host_batch_to_global,
                                        host_local_batch_size, param_hash)

    cfg = Config.make("tiny").override(**{
        "model.length": 16, "model.txt_length": 8, "model.img_length": 8,
        "model.text_vocab_size": 40, "model.image_vocab_size": 24,
        "model.dropout": 0.0, "trainer.warmup_steps": 2,
        "trainer.max_steps": 3, "trainer.global_batch_size": 8})

    global_batch = 8
    local_b = host_local_batch_size(global_batch)
    assert local_b == 4

    def local_batches(seed):
        """Each host draws ITS slice of the deterministic global batch."""
        rng = np.random.RandomState(seed)
        toks = rng.randint(0, 40, (global_batch, 16)).astype(np.int32)
        mod = np.zeros((global_batch, 16), np.int32)
        mod[:, 8:] = 1
        toks[:, 8:] = rng.randint(40, 64, (global_batch, 8))
        sl = slice(pid * local_b, (pid + 1) * local_b)
        return {"input_ids": toks[sl], "modality": mod[sl]}

    trainer = Trainer(cfg, run_dir, log_every=100, val_every=0,
                      ckpt_every=0)

    # direct check of the assembly helper: global shape + content
    b0 = local_batches(0)
    g = host_batch_to_global(b0, trainer.mesh, trainer.data_sharding)
    assert g["input_ids"].shape == (global_batch, 16), g["input_ids"].shape

    class Loader:
        def __init__(self, seeds):
            self.seeds = list(seeds)

        def __iter__(self):
            return (local_batches(s) for s in self.seeds)

    fit_result = trainer.fit(Loader(range(100)), None, max_steps=3)
    val = trainer.validate(Loader(range(50, 54)), step=3, max_batches=4)
    trainer.close()

    result = {
        "process": pid,
        "fit_step": fit_result["step"],
        "param_hash": param_hash(trainer.state.params),
        "val": {k: float(v) for k, v in val.items()},
        "loss": float(fit_result.get("loss", float("nan"))),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[worker {pid}] done: {result}", flush=True)


if __name__ == "__main__":
    main()
