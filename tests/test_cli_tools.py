"""CLI tools: motion converter and kinematic viewer playback."""

import numpy as np
import pytest

from add_gym_tpu.cli.convert_motion import convert
from add_gym_tpu.motion.motion_file import LoopMode, load_motion
from add_gym_tpu.utils.assets import asset_path

CLIP = "motions/walk1_subject1.motion"


def test_convert_motion_round_trip(tmp_path):
    src = asset_path(CLIP)
    dst = str(tmp_path / "walk.pkl")
    convert(src, dst, fps=None, loop=None)
    a = load_motion(src)
    b = load_motion(dst)
    np.testing.assert_array_equal(a.frames, b.frames)
    assert b.fps == a.fps and b.loop_mode == a.loop_mode

    # loop-mode override
    dst2 = str(tmp_path / "walk_wrap.pkl")
    convert(dst, dst2, fps=60.0, loop="wrap")
    c = load_motion(dst2)
    assert c.loop_mode == LoopMode.WRAP and c.fps == 60.0


def test_viewer_playback_poses():
    import jax

    from add_gym_tpu.cli.view import playback_poses
    from add_gym_tpu.kinematics.char_model import load_char_model
    from add_gym_tpu.motion.motion_lib import load_motion_lib
    from add_gym_tpu.builder import MOTION_JOINT_ORDER

    char = load_char_model(asset_path("g1_description/g1_29.xml"))
    motion = load_motion_lib(
        asset_path(CLIP), MOTION_JOINT_ORDER, char, dt=1.0 / 30.0
    )
    times, body_pos, body_rot = playback_poses(char, motion, fps=30, max_seconds=1.0)
    assert body_pos.shape == (30, 30, 3) and body_rot.shape == (30, 30, 4)
    assert np.isfinite(body_pos).all()
    # the figure keeps its feet near the ground throughout a walk clip
    feet = [i for i, n in enumerate(char.body_names) if "ankle_roll" in n]
    assert body_pos[:, feet, 2].min() > -0.1
    assert body_pos[:, feet, 2].max() < 0.6
