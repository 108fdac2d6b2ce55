"""Submit a training job to a Cloud TPU VM / pod slice via gcloud.

Counterpart of the reference's deploy/submit_sagemaker_job.py: flattens a
local YAML override file into CLI overrides (submit_sagemaker_job.py:16-95
semantics) and launches the training module on every worker of the slice.
Requires gcloud auth; prints the commands with --dry-run.

Usage:
    python deploy/submit_tpu_job.py --tpu my-slice --zone us-central2-b \
        --config deploy/train-config.yaml [--dry-run]
"""

from __future__ import annotations

import argparse
import shlex
import subprocess

import yaml


def flatten(cfg, prefix=""):
    """Nested dict -> dotted key=value overrides (reference semantics)."""
    out = []
    for k, v in cfg.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out += flatten(v, key)
        elif isinstance(v, list):
            out.append(f"{key}={v}")
        else:
            out.append(f"{key}={v}")
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tpu", required=True, help="TPU VM / queued resource name")
    ap.add_argument("--zone", required=True)
    ap.add_argument("--project", default=None)
    ap.add_argument("--config", default="deploy/train-config.yaml")
    ap.add_argument("--workdir", default="~/add_gym_tpu")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    with open(args.config) as f:
        overrides = flatten(yaml.safe_load(f) or {})

    train_cmd = (
        f"cd {args.workdir} && "
        f"python -m add_gym_tpu.cli.train {' '.join(map(shlex.quote, overrides))}"
    )
    cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
        f"--zone={args.zone}", "--worker=all",
        f"--command={train_cmd}",
    ]
    if args.project:
        cmd.insert(6, f"--project={args.project}")

    print(" ".join(map(shlex.quote, cmd)))
    if not args.dry_run:
        subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
