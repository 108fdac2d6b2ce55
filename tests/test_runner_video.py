"""Trainer video/state-dump recording (reference scene-camera analog)."""

import os

import numpy as np
import jax
import pytest

from add_gym_tpu.learning.runner import Trainer
from add_gym_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["test_episodes"] = 0
    cfg["log_dir"] = str(tmp_path_factory.mktemp("logs"))
    cfg["experiment_name"] = "video_test"
    return Trainer(cfg, use_mesh=False)


def test_record_video(trainer, tmp_path):
    path = str(tmp_path / "rollout.gif")
    trainer.record_video(path, seconds=0.2)
    d = np.load(path + ".npz")
    assert d["body_pos"].shape == (20, 30, 3)
    assert np.isfinite(d["body_pos"]).all()
    # gif render is best-effort (matplotlib); npz dump is the contract
    if os.path.exists(path):
        assert os.path.getsize(path) > 0
