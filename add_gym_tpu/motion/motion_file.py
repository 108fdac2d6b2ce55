"""Motion clip file formats.

``.motion`` files are CSV text, one frame per line of 36 floats:
root pos (3) + root quat stored **xyzw** at columns 3-6 + 29 joint angles,
30 fps (ref: add_gym/anim/motion_lib.py:10-15, motion.py:11-37).  The pickle
format is ``{"loop_mode": int, "fps": int, "frames": ndarray}``.

Unlike the reference we never write the ``.pkl`` next to the source file
(the asset tree may be read-only); conversion is in-memory.
"""

from __future__ import annotations

import enum
import pickle
from dataclasses import dataclass

import numpy as np


class LoopMode(enum.IntEnum):
    CLAMP = 0
    WRAP = 1


DEFAULT_FPS = 30


@dataclass
class MotionClip:
    loop_mode: LoopMode
    fps: float
    frames: np.ndarray  # [T, 36]

    def get_length(self) -> float:
        return float(self.frames.shape[0] - 1) / self.fps

    def save(self, out_file: str) -> None:
        with open(out_file, "wb") as f:
            pickle.dump(
                {"loop_mode": int(self.loop_mode), "fps": self.fps, "frames": self.frames},
                f,
            )


def load_motion(path: str) -> MotionClip:
    if path.endswith(".motion"):
        from add_gym_tpu import native

        frames = np.atleast_2d(native.parse_motion_csv(path))
        return MotionClip(loop_mode=LoopMode.CLAMP, fps=DEFAULT_FPS, frames=frames)
    with open(path, "rb") as f:
        d = pickle.load(f)
    return MotionClip(
        loop_mode=LoopMode(d["loop_mode"]), fps=d["fps"], frames=np.asarray(d["frames"])
    )


def extract_pose_data(frame: np.ndarray):
    """Split a frame into (root_pos, root_rot_wxyz, joint_dof).

    Ref: motion_lib.py:10-15 (xyzw cols 3-6 -> wxyz).
    """
    root_pos = frame[..., 0:3]
    root_rot = frame[..., [6, 3, 4, 5]]
    joint_dof = frame[..., 7:]
    return root_pos, root_rot, joint_dof
