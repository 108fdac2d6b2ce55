"""Interactive probe: pose one mocap frame and inspect joint mappings.

Counterpart of the reference's ``add_gym/it.py`` (a one-off Genesis scene
that poses a single G1 frame and drops into IPython, documenting the
joint-order remap math, it.py:86-106).  Here: load the model + one motion
frame, run FK, print the DOF order / motion-column mapping and per-body
world poses, then drop into an interactive shell with everything bound.

Usage:
    python -m add_gym_tpu.cli.probe [task.motion_file=...] [frame_time=0.0]
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overrides = [a for a in argv if "=" in a]

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side inspection only
    import jax.numpy as jnp
    import numpy as np

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.utils.assets import asset_path
    from add_gym_tpu.kinematics.char_model import load_char_model
    from add_gym_tpu.motion.motion_lib import load_motion_lib
    from add_gym_tpu.physics.model import build_physics_model
    from add_gym_tpu.builder import MOTION_JOINT_ORDER

    cfg = load_config("train", overrides)
    t = float(cfg.get("frame_time", 0.0))

    mjcf = asset_path(cfg.get("robot", {}).get("asset_path", "g1_description/g1_29.xml"))
    char = load_char_model(mjcf)
    model = build_physics_model(mjcf, char)
    order = cfg["task"].get("motion_joint_order", MOTION_JOINT_ORDER)
    motion = load_motion_lib(
        asset_path(cfg["task"].get("motion_file", "motions/dance1_subject3.motion")),
        order, char, dt=0.01,
    )

    print(f"bodies: {model.nb}  dofs: {model.nd}  contact points: {model.ncp}")
    print("\nDOF order (BFS client order) vs motion-file column:")
    kin_order = char.get_joint_order()[1:]
    for i, name in enumerate(kin_order):
        col = list(order).index(name)
        lim = model.dof_limit[i]
        print(f"  dof {i:2d}  <- motion col {col:2d}  {name:34s} "
              f"range [{lim[0]:+.2f}, {lim[1]:+.2f}]")

    ids = jnp.zeros(1, jnp.int32)
    rp, rr, rv, rav, dp, dv = motion.get_motion_step(ids, jnp.array([t]))
    joint_rot = char.dof_to_rot(dp)
    body_pos, body_rot = char.forward_kinematics(rp, rr, joint_rot)

    print(f"\nframe at t={t:.2f}s: root_pos={np.asarray(rp[0]).round(3)}")
    for b, name in enumerate(model.body_names):
        print(f"  {name:32s} {np.asarray(body_pos[0, b]).round(3)}")

    ns = dict(
        char=char, model=model, motion=motion, cfg=cfg,
        rp=rp, rr=rr, dp=dp, dv=dv,
        joint_rot=joint_rot, body_pos=body_pos, body_rot=body_rot,
        jnp=jnp, np=np,
    )
    try:
        import IPython

        IPython.start_ipython(argv=[], user_ns=ns)
    except ImportError:
        import code

        code.interact(local=ns)


if __name__ == "__main__":
    main()
