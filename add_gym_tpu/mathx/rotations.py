"""Quaternion / rotation math for TPU (JAX).

Conventions match the reference framework (rsamf/add-gym,
``add_gym/util/torch_util.py``): quaternions are **wxyz**, rotations are
active, and all functions broadcast over arbitrary leading batch dims.

Everything here is pure jax.numpy and safe under ``jit``/``vmap``/``grad``.
Where the reference relies on boolean indexing we use ``jnp.where`` so the
functions stay shape-static for XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def normalize_angle(x):
    """Wrap angles to (-pi, pi].  Ref: torch_util.py:5-8."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def normalize(x, eps: float = _EPS):
    """Normalize the last axis to unit length.  Ref: torch_util.py:11-14."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def quat_unit(q):
    return normalize(q)


def quat_conjugate(q):
    """Ref: torch_util.py:34-36."""
    return jnp.concatenate([q[..., 0:1], -q[..., 1:]], axis=-1)


def quat_pos(q):
    """Flip quaternions into the w >= 0 hemisphere.  Ref: torch_util.py:39-44."""
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_mul(a, b):
    """Hamilton product, wxyz.  Ref: torch_util.py:47-61."""
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vectors v by quaternions q.  Ref: torch_util.py:64-70."""
    q_w = q[..., 0:1]
    q_v = q[..., 1:]
    t = 2.0 * jnp.cross(q_v, v)
    return v + q_w * t + jnp.cross(q_v, t)


def quat_rotate_inv(q, v):
    """Rotate by the inverse of q (assumes unit quaternion)."""
    return quat_rotate(quat_conjugate(q), v)


def quat_to_axis_angle(q):
    """Return (axis, angle) with angle in [0, pi].  Ref: torch_util.py:73-94."""
    eps = 1e-5
    q = quat_pos(q)
    length = jnp.linalg.norm(q[..., 1:], axis=-1)
    angle = 2.0 * jnp.arctan2(length, q[..., 0])
    axis = q[..., 1:] / jnp.maximum(length[..., None], _EPS)

    default_axis = jnp.zeros_like(axis).at[..., -1].set(1.0)
    mask = length > eps
    angle = jnp.where(mask, angle, jnp.zeros_like(angle))
    axis = jnp.where(mask[..., None], axis, default_axis)
    return axis, angle


def quat_to_matrix(q):
    """3x3 rotation matrix.  Ref: torch_util.py:97-117."""
    w, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    mat = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * w),
            two_s * (i * k + j * w),
            two_s * (i * j + k * w),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * w),
            two_s * (i * k - j * w),
            two_s * (j * k + i * w),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return mat.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(rm):
    """Robust matrix -> wxyz quaternion (Shepperd's method).

    The reference goes through axis-angle (torch_util.py:206-211) which is
    singular near angle=pi; we use the numerically stable branch-free method
    and keep the w>=0 convention via quat_pos.
    """
    m00, m01, m02 = rm[..., 0, 0], rm[..., 0, 1], rm[..., 0, 2]
    m10, m11, m12 = rm[..., 1, 0], rm[..., 1, 1], rm[..., 1, 2]
    m20, m21, m22 = rm[..., 2, 0], rm[..., 2, 1], rm[..., 2, 2]

    tr = m00 + m11 + m22
    s0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) * 2.0
    qw = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
    qx = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) * 2.0
    qy = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) * 2.0
    qz = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, qw, jnp.where(cond1, qx, jnp.where(cond2, qy, qz)))
    return quat_unit(quat_pos(q))


def quat_to_euler_zyx(q):
    """Returns [yaw, pitch, roll].  Ref: torch_util.py:120-141."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([yaw, pitch, roll], axis=-1)


def axis_angle_to_quat(axis, angle):
    """Ref: torch_util.py:189-195."""
    theta = 0.5 * angle[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return quat_unit(jnp.concatenate([w, xyz], axis=-1))


def quat_from_euler_xyz(roll, pitch, yaw):
    """Ref: torch_util.py:360-374."""
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    return jnp.stack(
        [
            cy * cr * cp + sy * sr * sp,
            cy * sr * cp - sy * cr * sp,
            cy * cr * sp + sy * sr * cp,
            sy * cr * cp - cy * sr * sp,
        ],
        axis=-1,
    )


def quat_to_exp_map(q):
    """Ref: torch_util.py:214-219."""
    axis, angle = quat_to_axis_angle(q)
    return angle[..., None] * axis


def exp_map_to_axis_angle(exp_map):
    """Ref: torch_util.py:245-263."""
    min_theta = 1e-5
    angle = jnp.linalg.norm(exp_map, axis=-1)
    axis = exp_map / jnp.maximum(angle[..., None], _EPS)
    angle = normalize_angle(angle)

    default_axis = jnp.zeros_like(exp_map).at[..., -1].set(1.0)
    mask = jnp.abs(angle) > min_theta
    angle = jnp.where(mask, angle, jnp.zeros_like(angle))
    axis = jnp.where(mask[..., None], axis, default_axis)
    return axis, angle


def exp_map_to_quat(exp_map):
    axis, angle = exp_map_to_axis_angle(exp_map)
    return axis_angle_to_quat(axis, angle)


def quat_diff(q0, q1):
    """dq such that dq * q0 = q1 (left difference).  Ref: torch_util.py:274-277."""
    return quat_mul(q1, quat_conjugate(q0))


def quat_diff_angle(q0, q1):
    """Geodesic angle between two quaternions.  Ref: torch_util.py:280-284."""
    _, angle = quat_to_axis_angle(quat_diff(q0, q1))
    return angle


def quat_normalize(q):
    """Unit quaternion in the positive hemisphere.  Ref: torch_util.py:293-296."""
    return quat_unit(quat_pos(q))


def quat_to_tan_norm(q):
    """6D rotation representation: rotated x-axis ++ rotated z-axis.

    Ref: torch_util.py:230-242.
    """
    ref_tan = jnp.zeros_like(q[..., 1:]).at[..., 0].set(1.0)
    tan = quat_rotate(q, ref_tan)
    ref_norm = jnp.zeros_like(q[..., 1:]).at[..., -1].set(1.0)
    norm = quat_rotate(q, ref_norm)
    return jnp.concatenate([tan, norm], axis=-1)


def slerp(q0, q1, t):
    """Spherical interpolation; t has one fewer dim than q.  Ref: torch_util.py:299-323."""
    cos_half_theta = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where((cos_half_theta < 0)[..., None], -q1, q1)
    cos_half_theta = jnp.abs(cos_half_theta)[..., None]

    half_theta = jnp.arccos(jnp.clip(cos_half_theta, -1.0, 1.0))
    sin_half_theta = jnp.sqrt(jnp.maximum(1.0 - cos_half_theta * cos_half_theta, 0.0))
    safe_sin = jnp.where(jnp.abs(sin_half_theta) < 0.001, 1.0, sin_half_theta)

    t = t[..., None]
    ratio_a = jnp.sin((1.0 - t) * half_theta) / safe_sin
    ratio_b = jnp.sin(t * half_theta) / safe_sin
    new_q = ratio_a * q0 + ratio_b * q1
    new_q = jnp.where(jnp.abs(sin_half_theta) < 0.001, 0.5 * q0 + 0.5 * q1, new_q)
    new_q = jnp.where(jnp.abs(cos_half_theta) >= 1.0, q0, new_q)
    return new_q


def calc_heading(q):
    """Yaw of the rotated x-axis.  Ref: torch_util.py:326-334."""
    ref_dir = jnp.zeros_like(q[..., 1:]).at[..., 0].set(1.0)
    rot_dir = quat_rotate(q, ref_dir)
    return jnp.arctan2(rot_dir[..., 1], rot_dir[..., 0])


def calc_heading_quat(q):
    """Ref: torch_util.py:337-345."""
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., 1:]).at[..., 2].set(1.0)
    return axis_angle_to_quat(axis, heading)


def calc_heading_quat_inv(q):
    """Ref: torch_util.py:348-356."""
    heading = calc_heading(q)
    axis = jnp.zeros_like(q[..., 1:]).at[..., 2].set(1.0)
    return axis_angle_to_quat(axis, -heading)


def quat_twist(q, twist_axis):
    """Twist component of q about twist_axis.  Ref: torch_util.py:385-395."""
    p = jnp.sum(twist_axis * q[..., 1:], axis=-1, keepdims=True)
    twist = jnp.concatenate([q[..., 0:1], p * twist_axis], axis=-1)
    return quat_normalize(twist)


def quat_twist_angle(q, twist_axis):
    """Signed twist angle about twist_axis.  Ref: torch_util.py:398-406."""
    twist = quat_twist(q, twist_axis)
    axis, angle = quat_to_axis_angle(twist)
    dot_axis = jnp.sum(twist_axis * axis, axis=-1)
    return jnp.where(dot_axis < 0, -angle, angle)
