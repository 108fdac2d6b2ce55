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
#
# Checkpoint channel (reference: CheckpointConfig syncs /opt/ml/checkpoints
# to S3, submit_sagemaker_job.py:224-227): set CKPT_GCS_URI=gs://... and
# the experiment dir is pulled before training (so a respawned spot node
# resumes) and rsynced back every CKPT_SYNC_SECS (default 300) by a
# background loop on worker 0.
set -euo pipefail

echo "host: $(hostname)  TPU_WORKER_ID=${TPU_WORKER_ID:-<unset>}"

# fail fast if assets are missing
python - <<'PY'
from add_gym_tpu.utils.assets import asset_root
print("assets:", asset_root())
PY

LOG_DIR=${LOG_DIR:-logs}
if [[ -n "${CKPT_GCS_URI:-}" ]]; then
  GSUTIL=$(command -v gsutil || command -v gcloud || true)
  if [[ -n "$GSUTIL" ]]; then
    echo "checkpoint channel: $CKPT_GCS_URI <-> $LOG_DIR"
    mkdir -p "$LOG_DIR"
    # pull any previous run state (spot resume)
    gsutil -m rsync -r "$CKPT_GCS_URI" "$LOG_DIR" 2>/dev/null || true
    if [[ "${TPU_WORKER_ID:-0}" == "0" ]]; then
      (
        while true; do
          sleep "${CKPT_SYNC_SECS:-300}"
          gsutil -m rsync -r "$LOG_DIR" "$CKPT_GCS_URI" || true
        done
      ) &
      SYNC_PID=$!
      # final sync when training exits, then stop the loop
      trap 'kill "$SYNC_PID" 2>/dev/null || true; gsutil -m rsync -r "$LOG_DIR" "$CKPT_GCS_URI" || true' EXIT
    fi
  else
    echo "warning: CKPT_GCS_URI set but no gsutil/gcloud on PATH" >&2
  fi
fi

python -m add_gym_tpu.cli.train "$@"
