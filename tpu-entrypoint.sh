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
  # sync via whichever tool exists (gsutil, else gcloud storage); fail
  # loudly if neither does — a silently dead channel breaks spot resume
  if command -v gsutil >/dev/null 2>&1; then
    bucket_rsync() { gsutil -m rsync -r "$1" "$2"; }
  elif command -v gcloud >/dev/null 2>&1; then
    bucket_rsync() { gcloud storage rsync --recursive "$1" "$2"; }
  else
    echo "error: CKPT_GCS_URI set but neither gsutil nor gcloud on PATH" >&2
    exit 1
  fi
  echo "checkpoint channel: $CKPT_GCS_URI <-> $LOG_DIR"
  mkdir -p "$LOG_DIR"
  # pull any previous run state (spot resume); an empty/missing prefix on a
  # first run is expected (|| true) but stderr stays visible
  bucket_rsync "$CKPT_GCS_URI" "$LOG_DIR" || true
  if [[ "${TPU_WORKER_ID:-0}" == "0" ]]; then
    (
      while true; do
        sleep "${CKPT_SYNC_SECS:-300}"
        bucket_rsync "$LOG_DIR" "$CKPT_GCS_URI" || true
      done
    ) &
    SYNC_PID=$!
    # final sync when training exits, then stop the loop
    trap 'kill "$SYNC_PID" 2>/dev/null || true; bucket_rsync "$LOG_DIR" "$CKPT_GCS_URI" || true' EXIT
  fi
fi

python -m add_gym_tpu.cli.train "$@"
