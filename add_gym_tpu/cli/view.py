"""Kinematic motion viewer: play a clip through the skeleton and render it.

TPU-native counterpart of the reference's ``add_gym/view.py`` (view.py:
290-325): plays a motion clip kinematically on the character model.  There
is no interactive GL viewer on a TPU host, so instead this (a) dumps the
full body-pose trajectory to ``.npz`` for offline tools and (b) optionally
renders an MP4/GIF stick-figure animation with matplotlib — the equivalent
of the reference's ghost-entity video capture (view.py:221-260).

Usage:
    python -m add_gym_tpu.cli.view task.motion_file=motions/walk1_subject1.motion \
        out=walk.npz video=walk.mp4 fps=30
"""

from __future__ import annotations

import os
import sys

import numpy as np


def playback_poses(char, motion, fps: float = 30.0, max_seconds: float | None = None):
    """Sample the motion at ``fps`` and FK every frame.

    Returns (times [T], body_pos [T, nb, 3], body_rot [T, nb, 4 wxyz]).
    """
    import jax
    import jax.numpy as jnp

    length = float(motion.lengths[0])
    if max_seconds is not None:
        length = min(length, max_seconds)
    times = np.arange(0.0, length, 1.0 / fps, dtype=np.float32)
    ids = jnp.zeros(times.shape[0], jnp.int32)
    rp, rr, _, _, dp, _ = motion.get_motion_step(ids, jnp.asarray(times))
    joint_rot = char.dof_to_rot(dp)
    body_pos, body_rot = jax.jit(char.forward_kinematics)(rp, rr, joint_rot)
    return times, np.asarray(body_pos), np.asarray(body_rot)


def render_video(char, body_pos: np.ndarray, out_file: str, fps: float = 30.0):
    """Stick-figure MP4/GIF of the body-position trajectory."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import animation

    parents = char.parent_indices
    T = body_pos.shape[0]

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")

    center = body_pos[..., :2].reshape(-1, 2).mean(axis=0)
    span = 1.2

    lines = []
    for j in range(1, char.num_bodies):
        (ln,) = ax.plot([], [], [], "o-", lw=2, ms=2, color="tab:blue")
        lines.append(ln)

    def init():
        ax.set_xlim(center[0] - span, center[0] + span)
        ax.set_ylim(center[1] - span, center[1] + span)
        ax.set_zlim(0, 2 * span)
        ax.set_box_aspect((1, 1, 1))
        return lines

    def update(t):
        for j in range(1, char.num_bodies):
            p = int(parents[j])
            seg = body_pos[t, [p, j]]
            lines[j - 1].set_data(seg[:, 0], seg[:, 1])
            lines[j - 1].set_3d_properties(seg[:, 2])
        ax.set_title(f"t = {t / fps:.2f}s")
        return lines

    anim = animation.FuncAnimation(
        fig, update, frames=T, init_func=init, blit=False
    )
    if out_file.endswith(".gif"):
        anim.save(out_file, writer="pillow", fps=int(fps))
    else:
        anim.save(out_file, writer=animation.FFMpegWriter(fps=int(fps)))
    plt.close(fig)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overrides = [a for a in argv if "=" in a]

    # kinematics only — run on host CPU (the axon TPU plugin force-registers
    # itself and overrides JAX_PLATFORMS, so pin the config directly)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.utils.assets import asset_path
    from add_gym_tpu.kinematics.char_model import load_char_model
    from add_gym_tpu.motion.motion_lib import load_motion_lib
    from add_gym_tpu.builder import MOTION_JOINT_ORDER

    cfg = load_config("view", overrides)
    fps = float(cfg.get("fps", 30.0))

    char = load_char_model(
        asset_path(cfg.get("robot", {}).get("asset_path", "g1_description/g1_29.xml"))
    )
    motion = load_motion_lib(
        asset_path(cfg["task"].get("motion_file", "motions/dance1_subject3.motion")),
        cfg["task"].get("motion_joint_order", MOTION_JOINT_ORDER),
        char,
        dt=1.0 / fps,
    )

    times, body_pos, body_rot = playback_poses(
        char, motion, fps=fps,
        max_seconds=float(cfg["max_seconds"]) if "max_seconds" in cfg else None,
    )
    print(f"played {times.shape[0]} frames ({times[-1]:.2f}s) "
          f"of {cfg['task'].get('motion_file')}")

    out = cfg.get("out", "motion_playback.npz")
    np.savez_compressed(
        out, times=times, body_pos=body_pos, body_rot=body_rot,
        body_names=np.asarray(char.body_names),
        parents=char.parent_indices,
    )
    print(f"wrote {out}")

    video = cfg.get("video")
    if video:
        if bool(cfg.get("mesh", True)):
            # mesh-quality render (render/mesh.py); stick figure on failure
            try:
                from add_gym_tpu.render.mesh import (
                    RobotMeshModel, render_frames, save_video,
                )

                mm = RobotMeshModel(
                    asset_path(
                        cfg.get("robot", {}).get(
                            "asset_path", "g1_description/g1_29.xml"
                        )
                    ),
                    list(char.body_names),
                )
                frames = render_frames(mm, body_pos, body_rot)
                save_video(frames, video, fps=fps)
                print(f"wrote {video} (mesh render)")
                return
            except Exception as e:
                print(f"mesh render failed ({e}); stick-figure fallback")
        render_video(char, body_pos, video, fps=fps)
        print(f"wrote {video}")


if __name__ == "__main__":
    main()
