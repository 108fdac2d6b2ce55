"""Featherstone Articulated-Body Algorithm, batched over environments.

TPU-native forward dynamics for a floating-base rigid-body tree with hinge
joints (the G1: free base + 29 hinges).  This replaces the reference's
external CUDA backends (mujoco_warp ``mjw.step`` / genesis) — see
SURVEY.md §2.1 and §7.4.

Design notes (TPU):
- The tree loop is unrolled in Python over the ~30 bodies (static topology);
  every per-body quantity is batched ``[N, ...]`` so XLA emits large fused
  VPU ops / batched 6x6 matmuls over the env axis.
- Joint-space damping (joint damping + PD kv) is integrated *implicitly* by
  adding ``dt * d`` to the ABA articulated-inertia denominator — the same
  stabilization idea as MuJoCo's ``implicitfast`` integrator (which the
  reference selects in configs/engine/mjwarp.yaml:13), without which the
  reference's stiff PD gains (kv = 2*sqrt(kp), robot.py:133-163) are
  unstable under explicit integration at 400 Hz.
- The free base is solved with one batched 6x6 linear solve.

All spatial quantities are expressed in each body's own frame with the
angular component first (see physics/spatial.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from add_gym_tpu.physics import spatial as sp


def _hinge_S(axis, batch_shape):
    """Motion subspace of a hinge about the body-frame axis: [axis; 0]."""
    a = jnp.broadcast_to(axis, batch_shape + (3,))
    return sp.sv(a, jnp.zeros_like(a))


def aba(
    model,
    # kinematics (computed by the engine's FK pass), all in world frame:
    body_rot_w,      # [N, nb, 3, 3] body->world rotation
    # joint state:
    root_vel_b,      # [N, 6] root spatial velocity in root body coords
    dof_vel,         # [N, nd]
    joint_rot,       # [N, nb-1, 3, 3] per-joint rotation (body i local joint)
    tau,             # [N, nd] joint torques (active + passive explicit part)
    f_ext_w,         # [N, nb, 6] external spatial force per body, world coords
                     #            about each body's own origin
    implicit_damping,  # [N, nd] or [nd]: d added to denominator scaled by dt
    dt: float,
    gravity: float = 9.81,
    ms=None,         # [N] per-env mass/inertia scale (None = 1)
):
    """Returns (qdd [N, nd], root_acc_true [N, 6] in root body coords)."""
    nb = model.nb
    N = dof_vel.shape[0]
    f32 = dof_vel.dtype

    parent = model.parent
    local_pos = jnp.asarray(model.local_pos, f32)
    local_quat_mat = _local_rot_mats(model, f32)          # [nb, 3, 3]
    axes = jnp.asarray(model.joint_axis, f32)
    armature = jnp.asarray(model.dof_armature, f32)

    # --- per-body fixed spatial inertia [nb, 6, 6], broadcast over N
    I_body = sp.spatial_inertia(
        jnp.asarray(model.mass, f32),
        jnp.asarray(model.com, f32),
        jnp.asarray(model.inertia, f32),
    )  # [nb, 6, 6]

    # --- parent->child transforms E_i (rotation), r_i (child origin in parent)
    # E_i = (L_i @ J_i)^T ; L from MJCF local quat, J from current joint angle.
    E = [None] * nb
    for i in range(1, nb):
        Li = local_quat_mat[i]                             # [3, 3]
        Ji = joint_rot[:, i - 1]                           # [N, 3, 3]
        E[i] = jnp.swapaxes(Li @ Ji, -1, -2)               # [N, 3, 3]

    # external forces to body coords (about body origin)
    Wt = jnp.swapaxes(body_rot_w, -1, -2)                  # world->body
    n_b = jnp.einsum("nbij,nbj->nbi", Wt, f_ext_w[..., 0:3])
    f_b = jnp.einsum("nbij,nbj->nbi", Wt, f_ext_w[..., 3:6])
    f_ext = jnp.concatenate([n_b, f_b], axis=-1)           # [N, nb, 6]

    # --- pass 1: velocities, bias, init articulated quantities
    v = [None] * nb
    c = [None] * nb
    IA = [None] * nb
    pA = [None] * nb

    v[0] = root_vel_b
    c[0] = jnp.zeros((N, 6), f32)
    one = jnp.ones((N,), f32) if ms is None else jnp.broadcast_to(ms, (N,))
    IA[0] = I_body[0] * one[:, None, None]
    pA[0] = (
        one[:, None] * sp.crf(v[0], jnp.einsum("ij,nj->ni", I_body[0], v[0]))
        - f_ext[:, 0]
    )

    S = [None] * nb
    for i in range(1, nb):
        p = int(parent[i])
        vp_child = sp.xform_motion(E[i], local_pos[i], v[p])
        di = i - 1
        S[i] = _hinge_S(axes[i], (N,))
        vJ = S[i] * dof_vel[:, di, None]
        v[i] = vp_child + vJ
        c[i] = sp.crm(v[i], vJ)
        IA[i] = I_body[i] * one[:, None, None]
        pA[i] = (
            one[:, None]
            * sp.crf(v[i], jnp.einsum("ij,nj->ni", I_body[i], v[i]))
            - f_ext[:, i]
        )

    # --- pass 2: inward articulated inertia recursion
    U = [None] * nb
    d_inv = [None] * nb
    u = [None] * nb
    imp = jnp.broadcast_to(jnp.asarray(implicit_damping, f32), (N, model.nd))
    for i in range(nb - 1, 0, -1):
        p = int(parent[i])
        di = i - 1
        U[i] = jnp.einsum("nij,nj->ni", IA[i], S[i])       # [N, 6]
        d = (
            jnp.einsum("ni,ni->n", S[i], U[i])
            + armature[di]
            + dt * imp[:, di]
        )
        d_inv[i] = 1.0 / d
        u[i] = tau[:, di] - jnp.einsum("ni,ni->n", S[i], pA[i])

        Ia = IA[i] - U[i][:, :, None] * U[i][:, None, :] * d_inv[i][:, None, None]
        pa = (
            pA[i]
            + jnp.einsum("nij,nj->ni", Ia, c[i])
            + U[i] * (u[i] * d_inv[i])[:, None]
        )
        IA[p] = IA[p] + sp.xform_inertia(E[i], local_pos[i], Ia)
        pA[p] = pA[p] + sp.inv_xform_force(E[i], local_pos[i], pa)

    # --- pass 3: outward accelerations
    a = [None] * nb
    # apparent acceleration of the free base (gravity handled as offset below)
    a[0] = -jnp.linalg.solve(IA[0], pA[0][..., None])[..., 0]

    qdd = jnp.zeros((N, model.nd), f32)
    for i in range(1, nb):
        p = int(parent[i])
        di = i - 1
        a_p = sp.xform_motion(E[i], local_pos[i], a[p]) + c[i]
        qdd_i = (u[i] - jnp.einsum("ni,ni->n", U[i], a_p)) * d_inv[i]
        a[i] = a_p + S[i] * qdd_i[:, None]
        qdd = qdd.at[:, di].set(qdd_i)

    # true root acceleration = apparent + gravity in root body coords
    g_w = jnp.asarray([0.0, 0.0, -gravity], f32)
    g_b = jnp.einsum("nij,nj->ni", Wt[:, 0], jnp.broadcast_to(g_w, (N, 3)))
    root_acc_true = a[0] + jnp.concatenate([jnp.zeros((N, 3), f32), g_b], axis=-1)
    return qdd, root_acc_true


def _local_rot_mats(model, dtype):
    q = jnp.asarray(model.local_quat, dtype)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    n = jnp.sum(q * q, axis=-1)
    s = 2.0 / n
    row0 = jnp.stack([1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)], -1)
    row1 = jnp.stack([s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)], -1)
    row2 = jnp.stack([s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)
