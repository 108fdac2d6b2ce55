"""Robot facade: lookups, gains, default pose, contact queries."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.engine import EngineParams, step
from add_gym_tpu.robot import Robot
from add_gym_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def robot():
    model = build_physics_model(asset_path("g1_description/g1_29.xml"))
    return Robot(model)


def test_lookups(robot):
    feet = [robot.model.body_names[i] for i in robot.links_by_tag("feet")]
    assert all("ankle" in n for n in feet) and len(feet) == 4
    knees = robot.joints_by_tag("knee")
    assert len(knees) == 2
    assert len(robot.joints_by_tag("arm")) == 14  # shoulders+elbows+wrists


def test_default_pose_and_gains(robot):
    # pelvis default height ~0.793 m for the zero pose
    assert 0.7 < float(robot.base_init_pos[2]) < 0.9
    assert robot.kp.shape == (29,) and (robot.kv == 2 * np.sqrt(robot.kp)).all()
    assert (robot.action_high > robot.action_low).all()


def test_default_state_stands(robot):
    """The facade's default state is physically consistent: feet touch the
    ground, nothing else does, with stiff gains it keeps standing."""
    params = EngineParams(
        kp=jnp.asarray(robot.kp * 3), kv=jnp.asarray(robot.kv * np.sqrt(3))
    )
    s = robot.default_sim_state(2)
    stp = jax.jit(
        lambda s: step(robot.model, params, s, jnp.asarray(robot.default_dof_pos)[None])
    )
    for _ in range(100):
        s, contact = stp(s)
    flags = robot.ground_contact_flags(np.asarray(contact), "feet")
    assert flags.all()
    not_feet = [
        i for i in range(robot.model.nb)
        if i not in robot.links_by_tag("feet")
    ]
    assert not (np.asarray(contact)[:, not_feet] > 0).any()
    assert float(s.root_pos[0, 2]) > 0.7


def test_body_poses(robot):
    s = robot.default_sim_state(3)
    pos, rot = robot.body_poses(s)
    assert pos.shape == (3, robot.model.nb, 3)
    # pelvis at init height; ankle links near the ground
    np.testing.assert_allclose(
        np.asarray(pos[:, 0, 2]), robot.base_init_pos[2], atol=1e-6
    )
    feet = robot.links_by_tag("feet")
    assert float(np.asarray(pos)[:, feet, 2].max()) < 0.12
