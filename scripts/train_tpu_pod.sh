#!/usr/bin/env bash
# Multi-host TPU pod training launcher.
#
# Counterpart of the reference's SLURM launchers
# (reference: scripts/train_large_scale_slurm.sh — 2 nodes x 8 L40S via
# sbatch + accelerate). On TPU pods there is no elastic launcher: the same
# command runs on every host (gcloud --worker=all) and jax.distributed
# wires the mesh from the TPU metadata.
#
# Usage (from a machine with gcloud):
#   TPU_NAME=my-v5e-64 ZONE=us-west4-a ./scripts/train_tpu_pod.sh \
#       model=extra_large trainer.max_steps=100000
set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
RUN_DIR=${RUN_DIR:-gs://your-bucket/runs/$(date +%Y%m%d_%H%M%S)}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd ~/unidisc_tpu && \
    python -m unidisc_tpu.train \
      --run-dir '$RUN_DIR' \
      --ckpt-every 1000 --val-every 500 \
      $*"

# Notes:
# - mesh axes: set mesh.dcn=<n_slices> for multislice; fsdp=-1 takes the
#   rest; tensor>1 enables megatron 2D sharding of block matrices.
# - production recipe: model=extra_large plus
#   'apply_experiments' large_scale_train + vq16_t2i (see docs/TRAIN.md);
#   from the CLI pass the overlay keys directly.
# - checkpoints are Orbax-async to RUN_DIR; preemption (SIGTERM) saves and
#   exits; rerunning the same command resumes.
