"""TPU training-job lifecycle: create / launch / status / resume / delete.

Counterpart of the reference's ``deploy/submit_sagemaker_job.py`` (315 LoC:
estimator config, config-channel flattening, CheckpointConfig spot-resume,
max-runtime/spot settings, :155-230).  GCP equivalents:

- ``create``  — provision a TPU queued resource (spot/on-demand, any
  v5e/v5p slice topology) and wait for ACTIVE: the analog of the
  SageMaker instance request incl. ``use_spot_instances`` (:212-218)
- ``launch``  — sync the repo, install, and start training on every worker
  through ``tpu-vm ssh --worker=all``, flattening a local YAML into dotted
  CLI overrides exactly like the reference flattens its train-config into
  ContainerArguments (:16-95); wires the **checkpoint channel**: a
  ``gs://`` bucket passed as ``ckpt_gcs`` is pulled before training
  (spot resume) and synced back periodically by tpu-entrypoint.sh — the
  analog of CheckpointConfig -> /opt/ml/checkpoints (:224-227)
- ``status`` / ``delete`` — queued-resource lifecycle management (the
  part SageMaker does implicitly)

All gcloud invocations print first; ``--dry-run`` stops there, so the
command assembly is unit-testable without credentials
(tests/test_deploy.py).
"""

from __future__ import annotations

import argparse
import json
import shlex
import subprocess
import time

import yaml


def flatten(cfg, prefix=""):
    """Nested dict -> dotted key=value overrides (reference :16-95)."""
    out = []
    for k, v in (cfg or {}).items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out += flatten(v, key)
        else:
            out.append(f"{key}={v}")
    return out


def _run(cmd, dry_run, capture=False):
    print(" ".join(map(shlex.quote, cmd)))
    if dry_run:
        return ""
    res = subprocess.run(cmd, check=True, capture_output=capture, text=True)
    return res.stdout if capture else ""


def _qr_base(args):
    cmd = ["gcloud", "compute", "tpus", "queued-resources"]
    return cmd


def cmd_create(args):
    """Provision a queued resource and wait until it is ACTIVE."""
    cmd = _qr_base(args) + [
        "create", args.tpu,
        f"--zone={args.zone}",
        f"--node-id={args.tpu}",
        f"--accelerator-type={args.accelerator_type}",
        f"--runtime-version={args.runtime_version}",
    ]
    if args.project:
        cmd.append(f"--project={args.project}")
    if args.spot:
        # the reference trains on spot with checkpoint-resume
        # (submit_sagemaker_job.py:212-218 use_spot_instances)
        cmd.append("--spot")
    _run(cmd, args.dry_run)
    if args.dry_run or args.no_wait:
        return
    deadline = time.time() + args.timeout
    while time.time() < deadline:
        state = cmd_status(args, quiet=True)
        print(f"queued resource {args.tpu}: {state}")
        if state == "ACTIVE":
            return
        if state in ("FAILED", "SUSPENDED"):
            raise RuntimeError(f"queued resource entered {state}")
        time.sleep(30)
    raise TimeoutError(f"{args.tpu} not ACTIVE after {args.timeout}s")


def cmd_status(args, quiet=False):
    cmd = _qr_base(args) + [
        "describe", args.tpu, f"--zone={args.zone}", "--format=json",
    ]
    if args.project:
        cmd.append(f"--project={args.project}")
    out = _run(cmd, args.dry_run, capture=True)
    if args.dry_run:
        return "DRY_RUN"
    state = json.loads(out).get("state", {}).get("state", "UNKNOWN")
    if not quiet:
        print(state)
    return state


def cmd_delete(args):
    cmd = _qr_base(args) + [
        "delete", args.tpu, f"--zone={args.zone}", "--force", "--quiet",
    ]
    if args.project:
        cmd.append(f"--project={args.project}")
    _run(cmd, args.dry_run)


def _ssh_all(args, remote_cmd):
    cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
        f"--zone={args.zone}", "--worker=all",
        f"--command={remote_cmd}",
    ]
    if args.project:
        cmd.insert(6, f"--project={args.project}")
    return cmd


def build_launch_command(args) -> list:
    """Assemble the per-worker training command (unit-tested)."""
    with open(args.config) as f:
        overrides = flatten(yaml.safe_load(f))
    env = ""
    if args.ckpt_gcs:
        # checkpoint channel: tpu-entrypoint.sh pulls this URI before
        # training (spot resume) and rsyncs the experiment dir back to it
        env = f"CKPT_GCS_URI={shlex.quote(args.ckpt_gcs)} "
    train_cmd = (
        f"cd {args.workdir} && {env}bash tpu-entrypoint.sh "
        f"{' '.join(map(shlex.quote, overrides))}"
    )
    return _ssh_all(args, train_cmd)


def cmd_launch(args):
    if args.sync:
        # repo tarball -> every worker (the reference ships a container
        # image; a source sync keeps the TPU VM flow dependency-light)
        sync_cmd = [
            "gcloud", "compute", "tpus", "tpu-vm", "scp", "--recurse",
            args.sync, f"{args.tpu}:{args.workdir}",
            f"--zone={args.zone}", "--worker=all",
        ]
        if args.project:
            sync_cmd.append(f"--project={args.project}")
        _run(sync_cmd, args.dry_run)
    _run(build_launch_command(args), args.dry_run)


def make_parser():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tpu", required=True)
    ap.add_argument("--zone", required=True)
    ap.add_argument("--project", default=None)
    ap.add_argument("--dry-run", action="store_true")
    sub = ap.add_subparsers(dest="command", required=True)

    c = sub.add_parser("create", help="provision a queued resource")
    c.add_argument("--accelerator-type", default="v5litepod-8")
    c.add_argument("--runtime-version", default="v2-alpha-tpuv5-lite")
    c.add_argument("--spot", action="store_true")
    c.add_argument("--no-wait", action="store_true")
    c.add_argument("--timeout", type=int, default=1800)

    l = sub.add_parser("launch", help="start training on all workers")
    l.add_argument("--config", default="deploy/train-config.yaml")
    l.add_argument("--workdir", default="~/add_gym_tpu")
    l.add_argument("--sync", default=None,
                   help="local repo path to scp to the workers first")
    l.add_argument("--ckpt-gcs", default=None,
                   help="gs:// checkpoint-channel URI (spot resume)")

    sub.add_parser("status", help="queued-resource state")
    sub.add_parser("delete", help="tear the queued resource down")
    return ap


def main(argv=None):
    args = make_parser().parse_args(argv)
    {"create": cmd_create, "launch": cmd_launch,
     "status": cmd_status, "delete": cmd_delete}[args.command](args)


if __name__ == "__main__":
    main()
