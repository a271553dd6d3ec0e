"""Trainer shell: the step loop around the jitted SPMD train step.

Replaces the reference's Diffusion.train() epoch/step loop and its callback
battery (reference: model.py:1304-1670; checkpoint triggers
model_setup.py:959-1004; signal-handler checkpointing model_setup.py:472-553;
throughput callback model_setup.py:814-843). Host-side work is only data
feeding, metric logging, and checkpoint orchestration — all math lives in
the jitted step.
"""

from __future__ import annotations

import signal
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unidisc_tpu.config import Config
from unidisc_tpu.models.dit import count_params, init_dit
from unidisc_tpu.parallel.mesh import make_mesh
from unidisc_tpu.training.checkpoint import CheckpointManager
from unidisc_tpu.training.train_state import (init_train_state,
                                              make_eval_step,
                                              make_train_step,
                                              shard_train_step)
from unidisc_tpu.utils.logging import MetricLogger
from unidisc_tpu.utils.monitor import ThroughputMonitor

LN2 = float(np.log(2.0))


def metrics_to_host(metrics) -> dict:
    """One host transfer for the whole metrics tuple."""
    vals = jax.device_get(metrics)
    out = {"loss": float(vals.loss), "grad_norm": float(vals.grad_norm)}
    tok = max(float(vals.token_count), 1.0)
    nll = float(vals.nll_sum) / tok
    out["nll"] = nll
    out["bpd"] = nll / LN2
    out["ppl"] = float(np.exp(min(nll, 50.0)))
    if float(vals.txt_count) > 0:
        t = float(vals.nll_txt_sum) / float(vals.txt_count)
        out["txt_nll"] = t
        out["txt_ppl"] = float(np.exp(min(t, 50.0)))
    if float(vals.img_count) > 0:
        i = float(vals.nll_img_sum) / float(vals.img_count)
        out["img_nll"] = i
        out["img_bpd"] = i / LN2
    return out


def restore_base_params(run_dir: str, expect_like=None):
    """Restore a prior run's EMA params to serve as a frozen LoRA base.

    The run's own config snapshot (checkpoint meta) builds the restore
    template, so the base run may have used any optimizer/schedule. EMA
    params are returned — the weights the reference evaluates and serves
    (model_eval.py:157-166)."""
    import json

    from unidisc_tpu.training.checkpoint import CheckpointManager
    mgr = CheckpointManager(f"{run_dir}/checkpoints")
    meta = mgr.read_meta()
    base_cfg = Config.from_json(json.dumps(meta["config"]))
    assert base_cfg.model.lora_rank == 0, (
        f"{run_dir} is itself a LoRA run — point base_checkpoint at the "
        f"full-parameter base run")
    _, tmpl = init_dit(jax.random.PRNGKey(base_cfg.seed), base_cfg.model)
    state, _ = mgr.restore(init_train_state(base_cfg, tmpl))
    params = state.ema_params
    if expect_like is not None:
        exp = jax.tree_util.tree_map(lambda l: tuple(l.shape), expect_like)
        got = jax.tree_util.tree_map(lambda l: tuple(l.shape), params)
        assert exp == got, (
            "base checkpoint architecture differs from config.model — "
            "the LoRA run must use the base run's model config")
    return params


class Trainer:
    def __init__(self, config: Config, run_dir: str, *,
                 use_wandb: bool = False, mesh=None, log_every: int = 10,
                 val_every: int = 0, ckpt_every: int = 1000,
                 max_ckpts: int = 3, throw_failure_at: int = 0,
                 val_use_ema: bool = True, base_params=None,
                 base_checkpoint: Optional[str] = None):
        # note: EMA (decay 0.9999) takes ~10k steps to catch up to the live
        # params — short runs should pass val_use_ema=False or the val
        # metrics reflect a mostly-initial EMA (reference evaluates with
        # EMA swapped in, model_eval.py:157-166)
        # fault injection for requeue/restart testing (reference:
        # trainer.throw_failure_for_testing, model.py:1580-1581)
        self.throw_failure_at = throw_failure_at
        self.config = config
        self.run_dir = run_dir
        self.log_every = log_every
        self.val_every = val_every
        self.ckpt_every = ckpt_every

        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self.model, params = init_dit(
            jax.random.PRNGKey(config.seed), config.model,
            remat=config.trainer.use_gradient_checkpointing)
        self.n_params = count_params(params)

        # LoRA fine-tuning: state.params becomes the rank-r adapter tree,
        # the base weights a frozen sharded constant (training/lora.py;
        # reference: model.use_lora + peft, model_setup.py:175-188).
        # The frozen base is a PRETRAINED model: pass `base_params` (a full
        # param tree) or `base_checkpoint` (a prior run dir — its EMA
        # params are restored). Without either, the base is the fresh
        # random init above — almost never what a fine-tune wants, and
        # with zero_linear_init the frozen zero output head makes every
        # adapter gradient identically zero, so that combination errors.
        self.param_map = None
        self._lora_base_checkpoint = None
        if config.model.lora_rank > 0:
            from unidisc_tpu.parallel.mesh import params_shardings
            from unidisc_tpu.training.lora import (count_lora_params,
                                                   lora_from_config,
                                                   lora_param_map)
            if base_checkpoint is not None:
                assert base_params is None, \
                    "pass base_params OR base_checkpoint, not both"
                import os
                params = restore_base_params(base_checkpoint,
                                             expect_like=params)
                self._lora_base_checkpoint = os.path.abspath(base_checkpoint)
            elif base_params is not None:
                params = base_params
            elif config.model.zero_linear_init:
                raise ValueError(
                    "LoRA on a random-init base with zero_linear_init=True "
                    "cannot learn: the frozen zero output head blocks all "
                    "adapter gradients. Pass base_checkpoint=/base_params= "
                    "(a pretrained base), or set model.zero_linear_init="
                    "False for a from-scratch smoke run.")
            else:
                print("[trainer] WARNING: LoRA over a RANDOM-INIT base "
                      "(no base_checkpoint/base_params) — only rank-r "
                      "directions are trainable; fine-tuning a real model "
                      "needs a pretrained base.")
            base = jax.device_put(params,
                                  params_shardings(params, self.mesh))
            adapter = lora_from_config(
                jax.random.PRNGKey(config.seed + 1), base, config.model)
            self.base_params = base
            self.param_map = lora_param_map(
                base, alpha=config.model.lora_alpha,
                rank=config.model.lora_rank)
            print(f"[trainer] LoRA r={config.model.lora_rank}: "
                  f"{count_lora_params(adapter):,} trainable / "
                  f"{self.n_params:,} total params")
            params = adapter

        self.host_offload = bool(config.trainer.host_offload_optimizer)
        if self.host_offload:
            # Host-offloaded fp32-master training (training/offload.py):
            # single-device by design — multi-chip memory scaling is the
            # FSDP mesh, this is the one-chip answer for models whose
            # fp32 state exceeds HBM (1.4B on a 16G v5e).
            from unidisc_tpu.training.offload import (
                init_offload_state, make_offload_train_step)
            assert self.mesh.devices.size == 1, (
                "host_offload_optimizer is a single-device mode; use the "
                "FSDP mesh for multi-chip memory scaling")
            # pinned_host memory kinds + compute_on need a TPU runtime;
            # the CPU backend runs the same math un-annotated (tested
            # exactly equivalent, tests/test_train_step.py)
            self._offload_annotate = jax.default_backend() not in ("cpu",)
            self.state = init_offload_state(
                config, params, annotate=self._offload_annotate,
                chunks=config.trainer.host_offload_chunks)
            # a PYTHON pipeline of jitted programs, not one jit — see
            # training/offload.py's design notes for why
            self.train_step = make_offload_train_step(
                config, self.model, annotate=self._offload_annotate)
            from unidisc_tpu.parallel.mesh import batch_sharding
            self.data_sharding = batch_sharding(self.mesh)
            if val_use_ema:
                print("[trainer] host_offload_optimizer: validation uses "
                      "the LIVE bf16 working weights (the EMA lives on "
                      "the host in chunks; gather_ema() for offline "
                      "EMA eval)")
            self.eval_step = jax.jit(make_eval_step(config, self.model,
                                                    mesh=self.mesh,
                                                    use_ema=False))
        else:
            state = init_train_state(config, params)
            step_fn = make_train_step(config, self.model, mesh=self.mesh,
                                      param_map=self.param_map)
            self.train_step, self.state, self.data_sharding = \
                shard_train_step(step_fn, state, self.mesh)
            self.eval_step = jax.jit(make_eval_step(config, self.model,
                                                    mesh=self.mesh,
                                                    use_ema=val_use_ema,
                                                    param_map=self.param_map))

        self.ckpt = CheckpointManager(
            f"{run_dir}/checkpoints", max_to_keep=max_ckpts,
            save_interval_steps=ckpt_every)
        self.logger = MetricLogger(run_dir, use_wandb=use_wandb,
                                   console_every=log_every)
        self.monitor = ThroughputMonitor(self.n_params)
        self._stop = False

    # ------------------------------------------------------------------
    def maybe_restore(self, loader=None) -> int:
        """Resume from the latest checkpoint if one exists
        (reference: main.py:470-539 determine_ckpt + auto-resume)."""
        step = self.ckpt.latest_step()
        if step is None:
            return 0
        self.state, meta = self.ckpt.restore(self.state)
        if loader is not None and "loader" in meta and \
                hasattr(loader, "load_state_dict"):
            loader.load_state_dict(meta["loader"])
        print(f"[trainer] resumed from step {step}")
        return int(step)

    def _install_signal_handler(self, loader):
        """SIGTERM/SIGUSR1 -> checkpoint then stop (reference requeue
        handler: model_setup.py:472-553)."""
        def handler(signum, frame):
            print(f"[trainer] signal {signum}: checkpointing then stopping")
            self._stop = True
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass  # not main thread

    # ------------------------------------------------------------------
    def fit(self, train_loader: Iterator, val_loader=None,
            max_steps: Optional[int] = None, *,
            overfit_first_batch: bool = False,
            print_hashes: bool = False) -> dict:
        cfg = self.config
        max_steps = max_steps or cfg.trainer.max_steps
        start = self.maybe_restore(train_loader)
        self._install_signal_handler(train_loader)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        if print_hashes:
            from unidisc_tpu.utils.dist import param_hash
            print(f"[trainer] param_hash={param_hash(self.state.params)} "
                  f"(determinism check)")
        if overfit_first_batch:
            # loss-goes-down smoke (reference: trainer.overfit_on_first_batch,
            # model.py:800-805)
            first = next(iter(train_loader))
            train_loader = iter(lambda: first, None)

        step = start
        last = {}
        multihost = jax.process_count() > 1
        # per-phase wall-times (reference: model.py:1392/1435/1548 —
        # dataloading/h2d/dispatch; device compute is async and shows up
        # in tokens/sec)
        from unidisc_tpu.utils.monitor import PhaseTimer
        phases = PhaseTimer()
        loader_it = iter(train_loader)
        while True:
            with phases("data"):
                batch = next(loader_it, None)
            if batch is None or step >= max_steps or self._stop:
                break
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            with phases("h2d"):
                if multihost:
                    # each host feeds its local slice of the global batch
                    from unidisc_tpu.utils.dist import host_batch_to_global
                    jbatch = host_batch_to_global(arrays, self.mesh,
                                                  self.data_sharding)
                else:
                    jbatch = jax.device_put(arrays, self.data_sharding)
            with phases("dispatch"):
                self.state, metrics = self.train_step(self.state, jbatch,
                                                      rng)
            step += 1
            if self.throw_failure_at and step == self.throw_failure_at:
                self._save(step, train_loader, force=True)
                self.ckpt.wait()
                raise RuntimeError(
                    f"injected failure at step {step} "
                    f"(throw_failure_at, for restart testing)")

            b, l = batch["input_ids"].shape
            self.monitor.step(b, b * l)

            if step % self.log_every == 0 or step == max_steps:
                last = metrics_to_host(metrics)
                last.update(self.monitor.stats())
                last.update(phases.stats())
                self.logger.log(last, step)

            if self.val_every and val_loader is not None and \
                    step % self.val_every == 0:
                self.validate(val_loader, step)

            if self.ckpt_every and step % self.ckpt_every == 0:
                self._save(step, train_loader)
                self._last_saved = step

        if getattr(self, "_last_saved", None) != step:
            self._save(step, train_loader, force=True)
        self.ckpt.wait()
        return {"step": step, **last}

    # ------------------------------------------------------------------
    def validate(self, val_loader, step: int, max_batches: int = 16) -> dict:
        """Aggregate val NLL/BPD/PPL (reference: model.py:1187 validate +
        standalone_metrics MeanMetric collections)."""
        rng = jax.random.PRNGKey(self.config.seed + 2)
        sums = None
        multihost = jax.process_count() > 1
        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            arrays = {k: v for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            if multihost:
                # per-host local slices -> one global sharded batch; the
                # eval_step's metric sums are global (computed over the
                # sharded batch inside jit), so device_get on any host
                # yields the SAME aggregate — no gather_object needed
                from unidisc_tpu.utils.dist import host_batch_to_global
                jbatch = host_batch_to_global(arrays, self.mesh,
                                              self.data_sharding)
            else:
                jbatch = jax.device_put(arrays, self.data_sharding)
            m = self.eval_step(self.state, jbatch,
                               jax.random.fold_in(rng, i))
            vals = jax.device_get(m)
            cur = np.asarray([vals.nll_sum, vals.token_count,
                              vals.nll_txt_sum, vals.txt_count,
                              vals.nll_img_sum, vals.img_count,
                              vals.loss, 1.0], np.float64)
            sums = cur if sums is None else sums + cur
        if sums is None:
            return {}
        nll = sums[0] / max(sums[1], 1)
        out = {"val/loss": sums[6] / sums[7], "val/nll": nll,
               "val/bpd": nll / LN2, "val/ppl": float(np.exp(min(nll, 50.0)))}
        if sums[3] > 0:
            out["val/txt_ppl"] = float(np.exp(min(sums[2] / sums[3], 50.0)))
        if sums[5] > 0:
            out["val/img_bpd"] = sums[4] / sums[5] / LN2
        self.logger.log(out, step)
        return out

    # ------------------------------------------------------------------
    def _save(self, step: int, loader, force: bool = False):
        extra = {}
        if hasattr(loader, "state_dict"):
            extra["loader"] = loader.state_dict()
        if self.param_map is not None:
            # record how to rebuild the frozen base (engine --ckpt restore
            # of a LoRA run: serving/engine.py) and export the live adapter
            # as an npz for the --lora flag
            if self._lora_base_checkpoint:
                extra["lora_base_checkpoint"] = self._lora_base_checkpoint
            from unidisc_tpu.training.lora import save_lora
            save_lora(f"{self.run_dir}/lora_adapter.npz",
                      jax.device_get(self.state.params),
                      alpha=self.config.model.lora_alpha,
                      rank=self.config.model.lora_rank)
        self.ckpt.save(step, self.state, self.config, extra=extra,
                       force=force)

    def close(self):
        self.ckpt.wait()
        self.ckpt.close()
        self.logger.close()
