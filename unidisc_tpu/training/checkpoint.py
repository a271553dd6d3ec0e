"""Orbax checkpointing for the SPMD train state.

TPU-native replacement for ALL THREE reference checkpoint families
(reference: §SURVEY 5 — accelerate save_state main.py:765-826, XLA SPMD
torch.distributed.checkpoint with SPMDSavePlanner model_setup.py:865-898,
and weights-only safetensors loads): one Orbax CheckpointManager handles
sharded async saves over the GSPMD mesh, retention, and latest-step
discovery. Config and dataloader state ride along as JSON.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from unidisc_tpu.config import Config
from unidisc_tpu.training.train_state import TrainState


class CheckpointManager:
    """Async, sharded, retention-limited checkpointing.

    Layout: <dir>/<step>/state (orbax pytree) + <dir>/<step>/meta (json:
    config snapshot + sampler/dataloader state), mirroring the reference's
    config-in-ckpt snapshot (main.py:460-468 save_config_to_ckpt) and
    checkpoints_total_limit retention (main.py:391-417).
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 save_interval_steps: int = 1000, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=options,
            item_names=("state", "meta"),
        )

    # ------------------------------------------------------------------
    def save(self, step: int, state: TrainState, config: Config,
             extra: Optional[dict] = None, force: bool = False) -> bool:
        """Async save; returns True if a save was started
        (reference async SPMD save: model_setup.py:976-986).

        Saving a step that already exists on disk is a no-op, not an
        error — resuming a run that already reached max_steps re-fires
        the final save (surfaced by the round-2 soak)."""
        if step in (self._mgr.all_steps() or []):
            return False
        meta = {"config": json.loads(config.to_json()),
                "step": int(step), **(extra or {})}
        return self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            force=force,
        )

    def restore(self, state_template: TrainState,
                step: Optional[int] = None) -> tuple:
        """Restore (state, meta). `state_template` provides the pytree
        structure/shardings (abstract target for sharded restore)."""
        step = self.latest_step() if step is None else step
        assert step is not None, f"no checkpoint found in {self.directory}"
        target = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template)
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return out["state"], out["meta"]

    def read_meta(self, step: Optional[int] = None) -> dict:
        """Restore only the JSON meta item (config snapshot + extras) —
        used to learn the saved pytree's SHAPE before building a restore
        template (e.g. a LoRA run's checkpoints hold the adapter-sized
        tree, not full params)."""
        step = self.latest_step() if step is None else step
        assert step is not None, f"no checkpoint found in {self.directory}"
        out = self._mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))
        return out["meta"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def wait(self):
        """Block until any in-flight async save completes."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
