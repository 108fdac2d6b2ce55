"""CharModel parsing + dof/rot conversion tests on the real G1 MJCF."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.kinematics.char_model import load_char_model, JointType


@pytest.fixture(scope="module")
def model():
    from add_gym_tpu.utils.assets import asset_path

    return load_char_model(asset_path("g1_description/g1_29.xml"))


def test_bfs_order(model):
    # BFS ordering (ref kin_char_model.py:116-162): pelvis first, then its
    # three children in document order.
    assert model.body_names[0] == "pelvis"
    assert model.body_names[1] == "left_hip_pitch_link"
    assert model.body_names[2] == "right_hip_pitch_link"
    assert model.body_names[3] == "waist_yaw_link"
    assert model.num_bodies == 30
    assert model.dof_size == 29


def test_joint_types(model):
    assert JointType(int(model.joint_types[0])) == JointType.ROOT
    assert all(
        JointType(int(t)) == JointType.HINGE for t in model.joint_types[1:]
    )


def test_parents_are_earlier(model):
    assert model.parent_indices[0] == -1
    for j in range(1, model.num_bodies):
        assert 0 <= model.parent_indices[j] < j


def test_dof_offsets(model):
    # root occupies no client dofs; hinges are consecutive
    np.testing.assert_array_equal(model.dof_offsets, np.arange(-1, 29).clip(0))


def test_joint_order_contains_expected_names(model):
    order = model.get_joint_order()
    assert order[0] == "root"
    assert "left_hip_pitch_joint" in order
    assert "right_wrist_yaw_joint" in order
    assert len(order) == 30


def test_dof_rot_round_trip(model):
    key = jax.random.PRNGKey(1)
    dof = 0.5 * jax.random.normal(key, (7, 29))
    joint_rot = model.dof_to_rot(dof)
    assert joint_rot.shape == (7, 29, 4)
    dof2 = model.rot_to_dof(joint_rot)
    np.testing.assert_allclose(dof, dof2, atol=1e-4)


def test_dof_vel_finite_difference(model):
    dt = 0.01
    key = jax.random.PRNGKey(2)
    dof0 = 0.3 * jax.random.normal(key, (29,))
    vel = 0.7 * jax.random.normal(jax.random.PRNGKey(3), (29,))
    dof1 = dof0 + dt * vel
    r0 = model.dof_to_rot(dof0)
    r1 = model.dof_to_rot(dof1)
    est = model.compute_dof_vel(r0, r1, dt)
    np.testing.assert_allclose(est, vel, atol=1e-3)


def test_forward_kinematics_zero_pose(model):
    # at zero joint angles, world position = cumulative local translations
    root_pos = jnp.zeros(3)
    root_rot = jnp.array([1.0, 0, 0, 0])
    joint_rot = model.dof_to_rot(jnp.zeros(29))
    pos, quat = model.forward_kinematics(root_pos, root_rot, joint_rot)
    assert pos.shape == (30, 3)

    expect = np.zeros((30, 3))
    lt = model.local_translation
    lq = model.local_rotation_wxyz()
    import add_gym_tpu.mathx.rotations as rot

    wq = [np.array([1.0, 0, 0, 0])]
    for j in range(1, model.num_bodies):
        p = model.get_parent_id(j)
        expect[j] = expect[p] + np.asarray(
            rot.quat_rotate(jnp.asarray(wq[p], jnp.float32), jnp.asarray(lt[j]))
        )
        wq.append(np.asarray(rot.quat_mul(jnp.asarray(wq[p], jnp.float32), jnp.asarray(lq[j]))))
    np.testing.assert_allclose(pos, expect, atol=1e-5)


def test_forward_kinematics_batched(model):
    key = jax.random.PRNGKey(4)
    dof = 0.2 * jax.random.normal(key, (5, 29))
    joint_rot = model.dof_to_rot(dof)
    root_pos = jnp.tile(jnp.array([0.0, 0.0, 0.8]), (5, 1))
    root_rot = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (5, 1))
    pos, quat = jax.jit(model.forward_kinematics)(root_pos, root_rot, joint_rot)
    assert pos.shape == (5, 30, 3)
    assert quat.shape == (5, 30, 4)
    assert np.isfinite(np.asarray(pos)).all()


def test_mjcf_export_round_trip(tmp_path):
    """export_mjcf -> load_char_model reproduces the skeleton
    (ref kin_char_model.py:403-592 output_xml)."""
    import numpy as np
    from add_gym_tpu.kinematics.char_model import load_char_model
    from add_gym_tpu.utils.assets import asset_path

    char = load_char_model(asset_path("g1_description/g1_29.xml"))
    out = tmp_path / "skeleton.xml"
    char.export_mjcf(str(out))
    re = load_char_model(str(out))

    assert re.body_names == char.body_names
    assert re.get_joint_order() == char.get_joint_order()
    np.testing.assert_array_equal(re.parent_indices, char.parent_indices)
    np.testing.assert_allclose(
        re.local_translation, char.local_translation, atol=1e-4
    )
    np.testing.assert_allclose(re.joint_axes, char.joint_axes, atol=1e-4)
    np.testing.assert_array_equal(re.joint_types, char.joint_types)
