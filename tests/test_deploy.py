"""Deploy tooling: config flattening and job-lifecycle command assembly.

Ref: deploy/submit_sagemaker_job.py:16-95 (flattening), :203-230 (spot +
checkpoint channel).  All assembled gcloud commands are inspected dry —
no credentials needed.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from deploy.submit_tpu_job import build_launch_command, flatten, make_parser


def test_flatten_nested():
    cfg = {
        "engine": {"num_envs": 4096, "pallas": "auto"},
        "agent": {"steps_per_iter": 128},
        "seed": 7,
        "tags": [1, 2],
    }
    out = flatten(cfg)
    assert "engine.num_envs=4096" in out
    assert "engine.pallas=auto" in out
    assert "agent.steps_per_iter=128" in out
    assert "seed=7" in out
    assert "tags=[1, 2]" in out
    assert flatten({}) == [] and flatten(None) == []


def test_launch_command_assembly(tmp_path):
    cfg = tmp_path / "train.yaml"
    cfg.write_text("engine:\n  num_envs: 8192\nexperiment_name: podrun\n")
    args = make_parser().parse_args([
        "--tpu", "slice1", "--zone", "us-central2-b", "--project", "p",
        "--dry-run", "launch", "--config", str(cfg),
        "--ckpt-gcs", "gs://bkt/ckpts/podrun",
    ])
    cmd = build_launch_command(args)
    assert cmd[:6] == ["gcloud", "compute", "tpus", "tpu-vm", "ssh", "slice1"]
    assert "--worker=all" in cmd
    joined = cmd[-1]
    assert "engine.num_envs=8192" in joined
    assert "experiment_name=podrun" in joined
    # checkpoint channel rides as env for tpu-entrypoint.sh
    assert "CKPT_GCS_URI=gs://bkt/ckpts/podrun" in joined
    assert "tpu-entrypoint.sh" in joined


def test_create_spot_dry_run(capsys):
    from deploy.submit_tpu_job import main

    main([
        "--tpu", "slice1", "--zone", "us-central2-b", "--dry-run",
        "create", "--spot", "--accelerator-type", "v5p-16",
    ])
    out = capsys.readouterr().out
    assert "queued-resources create slice1" in out
    assert "--spot" in out
    assert "--accelerator-type=v5p-16" in out


def test_lifecycle_dry_run(capsys):
    from deploy.submit_tpu_job import main

    main(["--tpu", "s", "--zone", "z", "--dry-run", "status"])
    main(["--tpu", "s", "--zone", "z", "--dry-run", "delete"])
    out = capsys.readouterr().out
    assert "describe s" in out and "delete s" in out
