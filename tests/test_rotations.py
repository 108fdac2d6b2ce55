"""Golden tests for the quaternion/rotation library.

Checks closed-form identities and (where available) parity against
scipy-free numpy references.  Conventions: wxyz, active rotations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import add_gym_tpu.mathx.rotations as rot


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return rot.quat_unit(q)


@pytest.fixture
def keys():
    return jax.random.split(jax.random.PRNGKey(0), 8)


def test_quat_mul_identity(keys):
    q = rand_quat(keys[0], (32,))
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (32, 1))
    np.testing.assert_allclose(rot.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(rot.quat_mul(ident, q), q, atol=1e-6)


def test_quat_mul_inverse(keys):
    q = rand_quat(keys[0], (32,))
    prod = rot.quat_mul(q, rot.quat_conjugate(q))
    expect = jnp.tile(jnp.array([1.0, 0, 0, 0]), (32, 1))
    np.testing.assert_allclose(prod, expect, atol=1e-5)


def test_quat_rotate_matches_matrix(keys):
    q = rand_quat(keys[0], (32,))
    v = jax.random.normal(keys[1], (32, 3))
    m = rot.quat_to_matrix(q)
    np.testing.assert_allclose(
        rot.quat_rotate(q, v), jnp.einsum("nij,nj->ni", m, v), atol=1e-5
    )


def test_quat_rotate_composition(keys):
    q1, q2 = rand_quat(keys[0], (16,)), rand_quat(keys[1], (16,))
    v = jax.random.normal(keys[2], (16, 3))
    lhs = rot.quat_rotate(rot.quat_mul(q1, q2), v)
    rhs = rot.quat_rotate(q1, rot.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_axis_angle_round_trip(keys):
    axis = rot.normalize(jax.random.normal(keys[0], (64, 3)))
    angle = jax.random.uniform(keys[1], (64,), minval=0.01, maxval=np.pi - 0.01)
    q = rot.axis_angle_to_quat(axis, angle)
    axis2, angle2 = rot.quat_to_axis_angle(q)
    np.testing.assert_allclose(angle, angle2, atol=1e-5)
    np.testing.assert_allclose(axis, axis2, atol=1e-4)


def test_exp_map_round_trip(keys):
    em = 0.9 * np.pi * rot.normalize(jax.random.normal(keys[0], (64, 3)))
    em = em * jax.random.uniform(keys[1], (64, 1))
    q = rot.exp_map_to_quat(em)
    np.testing.assert_allclose(rot.quat_to_exp_map(q), em, atol=1e-4)


def test_exp_map_zero():
    em = jnp.zeros((4, 3))
    q = rot.exp_map_to_quat(em)
    np.testing.assert_allclose(q, jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)), atol=1e-6)


def test_matrix_quat_round_trip(keys):
    q = rot.quat_pos(rand_quat(keys[0], (128,)))
    m = rot.quat_to_matrix(q)
    q2 = rot.matrix_to_quat(m)
    np.testing.assert_allclose(q, q2, atol=1e-4)


def test_matrix_to_quat_near_pi():
    # 180-degree rotations are the singular case for axis-angle extraction
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.6, 0.8, 0)]:
        a = np.asarray(axis, np.float32)
        q = rot.axis_angle_to_quat(jnp.asarray(a), jnp.asarray(np.pi * 0.9999))
        m = rot.quat_to_matrix(q)
        q2 = rot.matrix_to_quat(m)
        dot = abs(float(jnp.sum(q * q2)))
        assert dot > 0.9999


def test_heading(keys):
    yaw = jax.random.uniform(keys[0], (32,), minval=-np.pi, maxval=np.pi)
    zero = jnp.zeros_like(yaw)
    q = rot.quat_from_euler_xyz(zero, zero, yaw)
    np.testing.assert_allclose(rot.calc_heading(q), yaw, atol=1e-5)

    # heading_quat_inv undoes the yaw component
    q_full = rot.quat_mul(q, rot.quat_from_euler_xyz(0.3 * yaw, 0.2 * yaw, zero))
    h_inv = rot.calc_heading_quat_inv(q_full)
    local = rot.quat_mul(h_inv, q_full)
    np.testing.assert_allclose(rot.calc_heading(local), zero, atol=1e-4)


def test_tan_norm(keys):
    q = rand_quat(keys[0], (32,))
    tn = rot.quat_to_tan_norm(q)
    assert tn.shape == (32, 6)
    # columns are orthonormal
    np.testing.assert_allclose(jnp.linalg.norm(tn[:, :3], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(tn[:, 3:], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(jnp.sum(tn[:, :3] * tn[:, 3:], axis=-1), 0.0, atol=1e-5)


def test_slerp_endpoints(keys):
    q0, q1 = rand_quat(keys[0], (16,)), rand_quat(keys[1], (16,))
    s0 = rot.slerp(q0, q1, jnp.zeros(16))
    s1 = rot.slerp(q0, q1, jnp.ones(16))
    np.testing.assert_allclose(jnp.abs(jnp.sum(s0 * q0, axis=-1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(jnp.abs(jnp.sum(s1 * q1, axis=-1)), 1.0, atol=1e-4)


def test_slerp_geodesic(keys):
    q0 = rand_quat(keys[0], (16,))
    q1 = rand_quat(keys[1], (16,))
    mid = rot.slerp(q0, q1, jnp.full(16, 0.5))
    d0 = rot.quat_diff_angle(q0, mid)
    d1 = rot.quat_diff_angle(mid, q1)
    np.testing.assert_allclose(d0, d1, atol=1e-3)


def test_quat_twist_angle():
    axis = jnp.array([0.0, 1.0, 0.0])
    angle = jnp.array([0.7, -1.2, 2.5, -2.9])
    axis_b = jnp.tile(axis, (4, 1))
    q = rot.axis_angle_to_quat(axis_b, angle)
    tw = rot.quat_twist_angle(q, axis_b)
    np.testing.assert_allclose(tw, angle, atol=1e-5)


def test_quat_diff_angle_small(keys):
    q0 = rand_quat(keys[0], (8,))
    dq = rot.axis_angle_to_quat(
        jnp.tile(jnp.array([0.0, 0, 1.0]), (8, 1)), jnp.full(8, 0.01)
    )
    q1 = rot.quat_mul(dq, q0)
    np.testing.assert_allclose(rot.quat_diff_angle(q0, q1), 0.01, atol=1e-4)


def test_euler_zyx(keys):
    yaw = jax.random.uniform(keys[0], (16,), minval=-3, maxval=3)
    pitch = jax.random.uniform(keys[1], (16,), minval=-1.4, maxval=1.4)
    roll = jax.random.uniform(keys[2], (16,), minval=-3, maxval=3)
    q = rot.quat_from_euler_xyz(roll, pitch, yaw)
    ypr = rot.quat_to_euler_zyx(q)
    np.testing.assert_allclose(ypr[:, 0], yaw, atol=1e-4)
    np.testing.assert_allclose(ypr[:, 1], pitch, atol=1e-4)
    np.testing.assert_allclose(ypr[:, 2], roll, atol=1e-4)


def test_jit_and_vmap_compatible(keys):
    q = rand_quat(keys[0], (8,))
    v = jax.random.normal(keys[1], (8, 3))
    jit_fn = jax.jit(rot.quat_rotate)
    np.testing.assert_allclose(jit_fn(q, v), rot.quat_rotate(q, v), atol=1e-6)
    vm = jax.vmap(rot.quat_rotate)(q, v)
    np.testing.assert_allclose(vm, rot.quat_rotate(q, v), atol=1e-6)
