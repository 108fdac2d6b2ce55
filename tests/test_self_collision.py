"""Sphere-sphere self-collision: crossed legs separate; engines agree."""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics import engine as eng
from add_gym_tpu.physics.fused_step import FusedModelConstants, fused_step
from add_gym_tpu.utils.assets import asset_path

from tests.test_physics import reference_gains, standing_state


@pytest.fixture(scope="module")
def model():
    return build_physics_model(asset_path("g1_description/g1_29.xml"))


def min_shin_distance(model, state):
    """Smallest distance between left and right shin/thigh spheres."""
    bp, br = eng.forward_kinematics(model, state)
    x = bp[:, model.sc_body] + jnp.einsum(
        "nsij,sj->nsi", br[:, model.sc_body], jnp.asarray(model.sc_pos)
    )
    left = [
        i for i, b in enumerate(model.sc_body)
        if model.body_names[b] in ("left_knee_link", "left_hip_yaw_link")
    ]
    right = [
        i for i, b in enumerate(model.sc_body)
        if model.body_names[b] in ("right_knee_link", "right_hip_yaw_link")
    ]
    d = x[:, left, None, :] - x[:, None, right, :]
    return float(jnp.sqrt(jnp.sum(d * d, -1)).min())


def crossed_state(model):
    """Standing pose with hip rolls driving the legs into each other."""
    s = standing_state(model, n=1)
    jn = list(model.joint_names)
    dof = np.zeros(model.nd, np.float32)
    dof[jn.index("left_hip_roll_joint")] = -0.35   # toward the right leg
    dof[jn.index("right_hip_roll_joint")] = 0.35
    return replace(
        s,
        dof_pos=jnp.asarray(dof)[None],
        root_pos=s.root_pos.at[:, 2].add(0.05),
    )


def test_model_has_sc_pairs(model):
    assert model.sc_pairs.shape[0] > 20
    assert model.sc_body.shape[0] == model.sc_pos.shape[0]


def test_crossed_legs_pushed_apart(model):
    kp, kv = reference_gains(model, scale=3.0)
    s = crossed_state(model)
    tgt = s.dof_pos

    def run(self_collision):
        params = eng.EngineParams(kp=kp, kv=kv, self_collision=self_collision)
        stp = jax.jit(lambda s: eng.step(model, params, s, tgt))
        x = s
        for _ in range(40):
            x, _ = stp(x)
        return x

    with_sc = run(True)
    without_sc = run(False)
    assert np.isfinite(np.asarray(with_sc.root_pos)).all()
    # self-collision must keep the legs measurably farther apart
    assert (
        min_shin_distance(model, with_sc)
        > min_shin_distance(model, without_sc) + 0.005
    )


def test_fused_engine_sc_parity(model):
    fc = FusedModelConstants(model)
    kp, kv = reference_gains(model, scale=3.0)
    params = eng.EngineParams(kp=kp, kv=kv)
    s = crossed_state(model)
    s = replace(
        s,
        root_pos=jnp.broadcast_to(s.root_pos, (4, 3)),
        root_quat=jnp.broadcast_to(s.root_quat, (4, 4)),
        root_vel=jnp.broadcast_to(s.root_vel, (4, 3)),
        root_ang_vel=jnp.broadcast_to(s.root_ang_vel, (4, 3)),
        dof_pos=jnp.broadcast_to(s.dof_pos, (4, model.nd)),
        dof_vel=jnp.broadcast_to(s.dof_vel, (4, model.nd)),
        pd_target=jnp.broadcast_to(s.pd_target, (4, model.nd)),
    )
    tgt = s.dof_pos
    s_ref, _ = jax.jit(lambda s, t: eng.step(model, params, s, t))(s, tgt)
    s_soa, _ = jax.jit(lambda s, t: fused_step(fc, params, s, t))(s, tgt)
    for name in ("root_pos", "dof_pos", "dof_vel", "root_vel"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_soa, name)),
            atol=5e-4, err_msg=name,
        )
