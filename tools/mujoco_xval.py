"""Measure trajectory divergence: TPU engine vs CPU MuJoCo (ground truth).

Runs the five VERDICT-prescribed scenarios (free fall, PD hold in air, PD
step response, standing settle, walk-clip tracking) single-env from
identical initial conditions, with the reference's solver semantics on the
MuJoCo side (see add_gym_tpu/physics/mujoco_xval.py), and prints a JSON
error report.  The numbers feed docs/PHYSICS.md and the bounds in
tests/test_mujoco_xval.py.

Usage:  python tools/mujoco_xval.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from dataclasses import replace

from add_gym_tpu.builder import MOTION_JOINT_ORDER
from add_gym_tpu.kinematics.char_model import load_char_model
from add_gym_tpu.motion.motion_lib import load_motion_lib
from add_gym_tpu.physics import engine as eng
from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.mujoco_xval import (
    get_mj_state, make_mj_sim, mj_control_step, set_mj_state,
)
from add_gym_tpu.utils.assets import asset_path


def ours_make(model, kp, kv):
    params = eng.EngineParams(kp=kp, kv=kv, substeps=4)
    step = jax.jit(lambda s, t: eng.step(model, params, s, t))
    return params, step


def run_pair(model, mj, step_jit, state0, targets, kp, kv):
    """Run both sims for len(targets) control steps; return per-step errors."""
    set_mj_state(
        mj,
        np.asarray(state0.root_pos[0]), np.asarray(state0.root_quat[0]),
        np.asarray(state0.root_vel[0]), np.asarray(state0.root_ang_vel[0]),
        np.asarray(state0.dof_pos[0]), np.asarray(state0.dof_vel[0]),
        pd_target=np.asarray(state0.pd_target[0]),
    )
    s = state0
    kp_np, kv_np = np.asarray(kp), np.asarray(kv)
    errs = {"dof": [], "root_pos": [], "root_h": [], "dof_vel": []}
    for t in range(targets.shape[0]):
        tgt = targets[t]
        s, _ = step_jit(s, tgt[None])
        mj_control_step(mj, kp_np, kv_np, np.asarray(tgt, np.float64))
        m = get_mj_state(mj)
        errs["dof"].append(np.abs(np.asarray(s.dof_pos[0]) - m["dof_pos"]).max())
        errs["root_pos"].append(
            np.linalg.norm(np.asarray(s.root_pos[0]) - m["root_pos"])
        )
        errs["root_h"].append(
            abs(float(s.root_pos[0, 2]) - float(m["root_pos"][2]))
        )
        errs["dof_vel"].append(
            np.abs(np.asarray(s.dof_vel[0]) - m["dof_vel"]).max()
        )
    return {k: np.asarray(v) for k, v in errs.items()}


def summarize(name, errs, horizon_s):
    out = {
        "scenario": name,
        "horizon_s": horizon_s,
        "dof_maxabs_final": float(errs["dof"][-1]),
        "dof_maxabs_peak": float(errs["dof"].max()),
        "root_pos_final_m": float(errs["root_pos"][-1]),
        "root_h_final_m": float(errs["root_h"][-1]),
        "dof_vel_maxabs_final": float(errs["dof_vel"][-1]),
    }
    print(json.dumps(out))
    return out


def main():
    mjcf = asset_path("g1_description/g1_29.xml")
    char = load_char_model(mjcf)
    model = build_physics_model(mjcf, char)
    from tests.test_physics import reference_gains, standing_state

    kp, kv = reference_gains(model)
    zero_g = jnp.zeros_like(kp)
    results = []

    # 1. free fall, no PD, no plane (0.3 s)
    mj = make_mj_sim(mjcf, model.joint_names, with_plane=False)
    params, step = ours_make(model, zero_g, zero_g)
    s0 = eng.default_state(model, 1)
    s0 = replace(s0, root_pos=s0.root_pos.at[:, 2].set(3.0))
    T = 30
    tgts = jnp.zeros((T, model.nd))
    errs = run_pair(model, mj, step, s0, tgts, zero_g, zero_g)
    results.append(summarize("free_fall", errs, T * 0.01))

    # 2. PD hold default pose in air (0.5 s)
    mj = make_mj_sim(mjcf, model.joint_names, with_plane=False)
    params, step = ours_make(model, kp, kv)
    s0 = eng.default_state(model, 1)
    s0 = replace(s0, root_pos=s0.root_pos.at[:, 2].set(3.0))
    T = 50
    tgts = jnp.zeros((T, model.nd))
    errs = run_pair(model, mj, step, s0, tgts, kp, kv)
    results.append(summarize("pd_hold_air", errs, T * 0.01))

    # 3. PD step response in air: 0.3 rad on every joint (0.5 s).
    # MuJoCo runs at 1600 Hz here (and in 4/5): the reference's explicit
    # per-substep PD (qfrc_applied) violates the explicit-damping stability
    # bound kv*dt/I < 2 at the low-inertia wrist/ankle joints at 400 Hz and
    # chatters at 15-30 rad/s; 4x substeps restores stability, giving a
    # trustworthy ground truth.  Our engine integrates the PD damping term
    # implicitly (aba.py articulated-inertia diagonal) and is stable at the
    # production 400 Hz — a documented improvement over the reference loop.
    mj = make_mj_sim(mjcf, model.joint_names, substeps=16, with_plane=False)
    s0 = eng.default_state(model, 1)
    s0 = replace(s0, root_pos=s0.root_pos.at[:, 2].set(3.0))
    T = 50
    tgts = jnp.tile(jnp.full((model.nd,), 0.3)[None], (T, 1))
    errs = run_pair(model, mj, step, s0, tgts, kp, kv)
    results.append(summarize("pd_step_air", errs, T * 0.01))

    # 4. standing settle on ground, PD default pose (2 s)
    from tests.test_physics import standing_state as _ss

    mj = make_mj_sim(mjcf, model.joint_names, substeps=16, with_plane=True)
    s0 = _ss(model, n=1)
    T = 200
    tgts = jnp.zeros((T, model.nd))
    errs = run_pair(model, mj, step, s0, tgts, kp, kv)
    results.append(summarize("standing_settle", errs, T * 0.01))

    # 5. walk-clip tracking on ground (2 s)
    lib = load_motion_lib(
        asset_path("motions/walk1_subject1.motion"),
        MOTION_JOINT_ORDER, char, dt=0.01,
    )
    ids = jnp.zeros(1, jnp.int32)
    rp, rq, rv, ra, dp, dv = lib.get_motion_step(ids, jnp.zeros(1))
    s0 = eng.default_state(model, 1)
    s0 = replace(
        s0,
        root_pos=rp, root_quat=rq, root_vel=rv, root_ang_vel=ra,
        dof_pos=dp, dof_vel=dv, pd_target=dp,
    )
    mj = make_mj_sim(mjcf, model.joint_names, substeps=16, with_plane=True)
    T = 200
    tgts = jnp.stack([
        lib.get_motion_step(ids, jnp.full(1, (t + 1) * 0.01))[4][0]
        for t in range(T)
    ])
    errs = run_pair(model, mj, step, s0, tgts, kp, kv)
    results.append(summarize("walk_track", errs, T * 0.01))

    with open("docs/mujoco_xval.json", "w") as f:
        json.dump(results, f, indent=2)
    print("wrote docs/mujoco_xval.json")


if __name__ == "__main__":
    main()
