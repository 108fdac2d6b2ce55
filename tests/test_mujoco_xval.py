"""Trajectory cross-validation against CPU MuJoCo (the reference's physics).

The reference's engine is MuJoCo (mjwarp_engine.py:1604 `mjw.step` with
configs/engine/mjwarp.yaml:13-20 solver settings); these tests step plain
``mujoco`` with identical semantics (see physics/mujoco_xval.py) from
identical initial conditions and bound the divergence.  Measured envelopes
live in docs/mujoco_xval.json / docs/PHYSICS.md; bounds here are ~3x the
measured values.

Ground-truth note: contact / step-response scenarios run MuJoCo at 1600 Hz
because the reference's explicit per-substep PD violates the explicit
stability bound (kv*dt/I < 2) at the low-inertia wrist/ankle joints at the
production 400 Hz and chatters at 15-30 rad/s.  Our engine integrates PD
damping implicitly and is stable at 400 Hz.
"""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

mujoco = pytest.importorskip("mujoco")

from add_gym_tpu.physics import engine as eng
from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.mujoco_xval import (
    get_mj_state, make_mj_sim, mj_control_step, set_mj_state,
)
from add_gym_tpu.utils.assets import asset_path
from tests.test_physics import reference_gains, standing_state


@pytest.fixture(scope="module")
def setup(g1_xml):
    model = build_physics_model(g1_xml)
    kp, kv = reference_gains(model)
    step = jax.jit(
        lambda p, s, t: eng.step(model, p, s, t),
        static_argnames=(),
    )
    return model, kp, kv, step


def _run_pair(model, mj, step, params, s, targets, kp, kv):
    set_mj_state(
        mj,
        np.asarray(s.root_pos[0]), np.asarray(s.root_quat[0]),
        np.asarray(s.root_vel[0]), np.asarray(s.root_ang_vel[0]),
        np.asarray(s.dof_pos[0]), np.asarray(s.dof_vel[0]),
        pd_target=np.asarray(s.pd_target[0]),
    )
    kp_np, kv_np = np.asarray(kp), np.asarray(kv)
    dof_err, root_err = 0.0, 0.0
    for t in range(targets.shape[0]):
        s, _ = step(params, s, targets[t][None])
        mj_control_step(mj, kp_np, kv_np, np.asarray(targets[t], np.float64))
    m = get_mj_state(mj)
    dof_err = float(np.abs(np.asarray(s.dof_pos[0]) - m["dof_pos"]).max())
    root_err = float(np.linalg.norm(np.asarray(s.root_pos[0]) - m["root_pos"]))
    root_h_err = abs(float(s.root_pos[0, 2]) - float(m["root_pos"][2]))
    return dof_err, root_err, root_h_err


def test_free_fall_exact(setup, g1_xml):
    """No PD, no contact: ABA + integrator vs MuJoCo to ~1e-7 (measured
    1.6e-10 rad / 3.1e-7 m over 0.3 s)."""
    model, kp, kv, step = setup
    zero = jnp.zeros_like(kp)
    params = eng.EngineParams(kp=zero, kv=zero, substeps=4)
    mj = make_mj_sim(g1_xml, model.joint_names, with_plane=False)
    s = eng.default_state(model, 1)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(3.0))
    tgts = jnp.zeros((30, model.nd))
    dof_err, root_err, _ = _run_pair(model, mj, step, params, s, tgts, zero, zero)
    assert dof_err < 1e-6
    assert root_err < 1e-4


def test_pd_hold_exact(setup, g1_xml):
    """PD holding the default pose in air: measured 1.8e-10 rad over 0.5 s
    (the implicit-vs-explicit damping difference vanishes at qd ~= 0)."""
    model, kp, kv, step = setup
    params = eng.EngineParams(kp=kp, kv=kv, substeps=4)
    mj = make_mj_sim(g1_xml, model.joint_names, with_plane=False)
    s = eng.default_state(model, 1)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(3.0))
    tgts = jnp.zeros((50, model.nd))
    dof_err, root_err, _ = _run_pair(model, mj, step, params, s, tgts, kp, kv)
    assert dof_err < 1e-6
    assert root_err < 1e-4


def test_pd_step_response(setup, g1_xml):
    """0.3 rad step on every joint, vs 1600 Hz MuJoCo (measured 0.21 rad
    peak — limit-adjacent joints — and 6.4 mm root drift over 0.5 s)."""
    model, kp, kv, step = setup
    params = eng.EngineParams(kp=kp, kv=kv, substeps=4)
    mj = make_mj_sim(g1_xml, model.joint_names, substeps=16, with_plane=False)
    s = eng.default_state(model, 1)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(3.0))
    tgts = jnp.tile(jnp.full((model.nd,), 0.3)[None], (50, 1))
    dof_err, root_err, _ = _run_pair(model, mj, step, params, s, tgts, kp, kv)
    assert dof_err < 0.6
    assert root_err < 0.03


def test_standing_settle_on_ground(setup, g1_xml):
    """Standing with ground contact, 1 s: measured 5.8 mrad dof / 1.4 mm
    height / 12 mm position divergence vs 1600 Hz MuJoCo (both sims tip
    over identically after ~1.5 s — an unstable equilibrium, excluded)."""
    model, kp, kv, step = setup
    params = eng.EngineParams(kp=kp, kv=kv, substeps=4)
    mj = make_mj_sim(g1_xml, model.joint_names, substeps=16, with_plane=True)
    s = standing_state(model, n=1)
    tgts = jnp.zeros((100, model.nd))
    dof_err, root_err, root_h_err = _run_pair(
        model, mj, step, params, s, tgts, kp, kv
    )
    assert dof_err < 0.05
    assert root_h_err < 0.02
    assert root_err < 0.1
