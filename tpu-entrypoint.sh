#!/usr/bin/env bash
# Multi-host training bootstrap for TPU pod slices.
#
# Counterpart of the reference's sagemaker-entrypoint.sh (torchrun c10d
# rendezvous + NCCL env tuning): on Cloud TPU there is no launcher to run —
# the same script starts on every host of the slice and
# jax.distributed.initialize() discovers the coordinator from the TPU
# metadata (parallel/mesh.py:initialize_distributed).  Checkpoint auto-
# resume (Trainer._maybe_resume) gives spot/preemption recovery, matching
# the reference's SageMaker CheckpointConfig contract.
set -euo pipefail

echo "host: $(hostname)  TPU_WORKER_ID=${TPU_WORKER_ID:-<unset>}"

# fail fast if assets are missing
python - <<'PY'
from add_gym_tpu.utils.assets import asset_root
print("assets:", asset_root())
PY

exec python -m add_gym_tpu.cli.train "$@"
