"""Fused physics substep in env-minor stacked layout — the TPU hot path.

The reference-layout engine (physics/engine.py) keeps per-body tensors as
``[N, 6, 6]``; on TPU the minor (6, 6) dims are padded to (8, 128) tiles,
wasting ~28x memory/bandwidth and fragmenting the step into hundreds of tiny
kernels.  Here every quantity carries the env axis N **last** (lanes) with
the small spatial dims leading (sublanes): rotations are ``[3, 3, N]``,
vectors ``[3, N]``, dof quantities ``[nd, N]``.  All spatial algebra is a
handful of broadcast-multiply/reduce ops per body, so the whole substep
compiles to a few thousand HLO ops (it fits XLA:CPU compile budgets) and
fuses into large VPU kernels on TPU (~11x faster than the reference layout
at 4096 envs).

Semantics are identical to engine.substep (same PD control, contacts,
implicit-damping ABA, semi-implicit Euler) — pinned by
tests/test_fused_step.py.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

import add_gym_tpu.mathx.rotations as rot
from add_gym_tpu.physics.engine import EngineParams, SimState, apply_pd_target
from add_gym_tpu.physics.model import PhysicsModel

# --------------------------------------------------------------------------
# stacked helpers: rotations [3, 3, N], vectors [3, N]; constants are numpy
# [3, 3] / [3] and broadcast over the minor env axis.


def m33_mul(A, B):
    """[3,3,N] @ [3,3,N] -> [3,3,N]."""
    return (A[:, :, None] * B[None, :, :]).sum(1)


def m33_mul_c(A, C):
    """[3,3,N] @ const [3,3] -> [3,3,N]."""
    return (A[:, :, None] * jnp.asarray(C)[None, :, :, None]).sum(1)


def c_mul_m33(C, B):
    """const [3,3] @ [3,3,N] -> [3,3,N]."""
    return (jnp.asarray(C)[:, :, None, None] * B[None, :, :]).sum(1)


def m33_vec(A, v):
    """[3,3,N] @ [3,N] -> [3,N]."""
    return (A * v[None, :, :]).sum(1)


def m33_T_vec(A, v):
    """[3,3,N]^T @ [3,N] -> [3,N]."""
    return (A * v[:, None, :]).sum(0)


def m33_vec_c(A, c):
    """[3,3,N] @ const [3] -> [3,N]."""
    return (A * jnp.asarray(c)[None, :, None]).sum(1)


def m33_T_vec_c(A, c):
    """[3,3,N]^T @ const [3] -> [3,N]."""
    return (A * jnp.asarray(c)[:, None, None]).sum(0)


def vcross(a, b):
    """[3,N] x [3,N] -> [3,N]."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def c_cross_vec(c, b):
    """const [3] x [3,N] -> [3,N]."""
    return jnp.stack(
        [
            c[1] * b[2] - c[2] * b[1],
            c[2] * b[0] - c[0] * b[2],
            c[0] * b[1] - c[1] * b[0],
        ]
    )


def vdot(a, b):
    """[3,N] . [3,N] -> [N]."""
    return (a * b).sum(0)


def _const_skew(r):
    return np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])


def _quat_to_mat_T(q):
    """wxyz quat [4, N] -> rotation [3, 3, N]."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    return jnp.stack(
        [
            jnp.stack([1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)]),
            jnp.stack([s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)]),
            jnp.stack([s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)]),
        ]
    )


# --------------------------------------------------------------------------


class FusedModelConstants:
    """Per-model constants precomputed on the host for the fused step."""

    def __init__(self, model: PhysicsModel):
        self.model = model
        nb = model.nb
        self.nb = nb
        self.parent = model.parent

        # local rotation matrices L_i (float constants)
        lq = np.asarray(model.local_quat, np.float64)
        self.L = [self._quat_mat(lq[i]) for i in range(nb)]
        self.r = np.asarray(model.local_pos, np.float64)

        # joint rotation M_i(c, s) = C0 + c*C1 + s*C2 (Rodrigues affine form)
        self.C0, self.C1, self.C2 = [], [], []
        axes = np.asarray(model.joint_axis, np.float64)
        for i in range(nb):
            K = _const_skew(axes[i])
            KK = K @ K
            self.C0.append(self.L[i] @ (np.eye(3) + KK))
            self.C1.append(self.L[i] @ (-KK))
            self.C2.append(self.L[i] @ K)
        self.axis = axes

        # spatial inertia blocks about the body origin (constants)
        mass = np.asarray(model.mass, np.float64)
        com = np.asarray(model.com, np.float64)
        inertia = np.asarray(model.inertia, np.float64)
        self.IA_A, self.IA_B, self.IA_D = [], [], []
        for i in range(nb):
            cx = _const_skew(com[i])
            self.IA_A.append(inertia[i] + mass[i] * (cx @ cx.T))
            self.IA_B.append(mass[i] * cx)
            self.IA_D.append(mass[i] * np.eye(3))
        self.mass = mass

        # dof params
        self.armature = np.asarray(model.dof_armature, np.float64)
        self.damping = np.asarray(model.dof_damping, np.float64)
        self.friction = np.asarray(model.dof_friction, np.float64)
        self.lo = np.asarray(model.dof_limit[:, 0], np.float64)
        self.hi = np.asarray(model.dof_limit[:, 1], np.float64)

        # contact points (vectorized over all P points)
        self.cp_body = np.asarray(model.cp_body, np.int32)
        self.cp_pos = np.asarray(model.cp_pos, np.float64)
        self.cp_radius = np.asarray(model.cp_radius, np.float64)
        self.cp_mass = np.asarray(model.cp_mass, np.float64)
        self.cp_mass_local = np.asarray(model.cp_mass_local, np.float64)
        self.cp_mass_stab = np.asarray(model.cp_mass_stab, np.float64)
        self.cp_explicit = np.asarray(model.cp_explicit)

    @staticmethod
    def _quat_mat(q):
        w, x, y, z = q
        n = (q * q).sum()
        s = 2.0 / n
        return np.array(
            [
                [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
                [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
                [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
            ]
        )

    def contact_gains(self, params: EngineParams, dt: float):
        """Per-point spring/damper/stick-mass constants [P] (host numpy).

        Same stability-capped rates as engine.contact_forces: explicit
        (designed load-bearing) points keep the load-scaled stiffness;
        auto points are capped by the rotation-aware stability mass.
        """
        omega_n = 2.0 / params.contact_timeconst
        k = self.cp_mass * omega_n * omega_n
        b = 2.0 * params.contact_dampratio * self.cp_mass * omega_n
        k_cap = np.where(self.cp_explicit, np.inf, 0.25 * self.cp_mass_stab / (dt * dt))
        b_cap = np.where(
            self.cp_explicit, self.cp_mass_local / dt, 0.5 * self.cp_mass_stab / dt
        )
        k = np.minimum(k, k_cap)
        b = np.minimum(b, b_cap)
        stick_m = np.where(self.cp_explicit, self.cp_mass_local, self.cp_mass_stab)
        return (
            k.astype(np.float32),
            b.astype(np.float32),
            stick_m.astype(np.float32),
        )


def fused_substep(fc: FusedModelConstants, params: EngineParams, state: SimState, dt):
    """One physics substep, stacked env-minor layout.

    Returns (state, body_contact [N, nb]).
    """
    nb = fc.nb
    nd = fc.model.nd
    N = state.root_pos.shape[0]
    f32 = state.root_pos.dtype

    # transpose state into env-minor layout
    root_pos = state.root_pos.T            # [3, N]
    root_quat = state.root_quat.T          # [4, N]
    root_vel = state.root_vel.T            # [3, N]
    root_ang = state.root_ang_vel.T        # [3, N]
    q = state.dof_pos.T                    # [nd, N]
    qd = state.dof_vel.T                   # [nd, N]
    tgt = state.pd_target.T                # [nd, N]

    cos = jnp.cos(q)                       # [nd, N]
    sin = jnp.sin(q)

    # ---------------------------------------------------------- FK + vel
    W: List = [None] * nb                  # body->world rotations [3,3,N]
    o: List = [None] * nb                  # world origins [3,N]
    omega: List = [None] * nb              # world angular velocity [3,N]
    vel: List = [None] * nb                # world origin linear velocity [3,N]
    M: List = [None] * nb                  # parent->body joint rotation [3,3,N]

    W[0] = _quat_to_mat_T(root_quat)
    o[0] = root_pos
    omega[0] = root_ang
    vel[0] = root_vel

    for i in range(1, nb):
        p = int(fc.parent[i])
        di = i - 1
        c, s = cos[di], sin[di]
        Mi = (
            jnp.asarray(fc.C0[i], f32)[:, :, None]
            + c[None, None, :] * jnp.asarray(fc.C1[i], f32)[:, :, None]
            + s[None, None, :] * jnp.asarray(fc.C2[i], f32)[:, :, None]
        )
        M[i] = Mi
        W[i] = m33_mul(W[p], Mi)
        r_w = m33_vec_c(W[p], fc.r[i])
        o[i] = o[p] + r_w
        ax_w = m33_vec_c(W[i], fc.axis[i])
        omega[i] = omega[p] + ax_w * qd[di][None, :]
        vel[i] = vel[p] + vcross(omega[p], r_w)

    # ---------------------------------------------------------- contacts
    # vectorized over all P points at once: [P, ..., N]
    Wst = jnp.stack(W)                      # [nb, 3, 3, N]
    ost = jnp.stack(o)                      # [nb, 3, N]
    omst = jnp.stack(omega)
    vest = jnp.stack(vel)

    cpb = fc.cp_body
    Wb = Wst[cpb]                           # [P, 3, 3, N]
    rp = (Wb * jnp.asarray(fc.cp_pos, f32)[:, None, :, None]).sum(2)  # [P,3,N]
    x_z = ost[cpb][:, 2] + rp[:, 2]         # [P, N]
    v_pt = vest[cpb] + jnp.cross(omst[cpb], rp, axis=1)               # [P,3,N]

    k_c, b_c, stick_m = fc.contact_gains(params, float(dt))
    phi = x_z - jnp.asarray(fc.cp_radius, f32)[:, None]
    pen = jnp.maximum(-phi, 0.0)
    active = (phi < 0.0).astype(f32)
    fn = jnp.maximum(
        jnp.asarray(k_c)[:, None] * pen - jnp.asarray(b_c)[:, None] * v_pt[:, 2],
        0.0,
    ) * active                               # [P, N]

    speed = jnp.sqrt(v_pt[:, 0] ** 2 + v_pt[:, 1] ** 2 + 1e-10)
    f_t_mag = jnp.minimum(
        params.friction_mu * fn, jnp.asarray(stick_m)[:, None] * speed / dt
    )
    scale = -f_t_mag / speed
    f_pt = jnp.stack([scale * v_pt[:, 0], scale * v_pt[:, 1], fn], axis=1)  # [P,3,N]
    n_pt = jnp.cross(rp, f_pt, axis=1)       # [P, 3, N]

    f_w = jax.ops.segment_sum(f_pt, cpb, nb)     # [nb, 3, N]
    n_w = jax.ops.segment_sum(n_pt, cpb, nb)
    contact = jax.ops.segment_sum(fn, cpb, nb)   # [nb, N]

    # ------------------------------------------------------- joint torques
    # kp/kv are [nd] (shared) or [N, nd] (per-env domain randomization)
    kp = jnp.asarray(params.kp, f32)
    kp = kp.T if kp.ndim == 2 else kp[:, None]
    kv = jnp.asarray(params.kv, f32)
    kv = kv.T if kv.ndim == 2 else kv[:, None]
    t_pd = jnp.clip(kp * (tgt - q) - kv * qd, -params.max_torque, params.max_torque)
    damping_c = jnp.asarray(fc.damping, f32)[:, None]
    friction_c = jnp.asarray(fc.friction, f32)[:, None]
    lo_c = jnp.asarray(fc.lo, f32)[:, None]
    hi_c = jnp.asarray(fc.hi, f32)[:, None]
    k_lim = 400.0
    tau = (
        t_pd
        - damping_c * qd
        - friction_c * jnp.tanh(qd / 0.05)
        + k_lim * jnp.maximum(lo_c - q, 0.0)
        - k_lim * jnp.maximum(q - hi_c, 0.0)
    )                                        # [nd, N]

    # ----------------------------------------------------------- ABA pass 1
    # spatial velocity in body coords, bias force, articulated inertia blocks
    w_b: List = [None] * nb
    v_b: List = [None] * nb
    c_n: List = [None] * nb                  # velocity-product acc (angular)
    c_f: List = [None] * nb                  # (linear)
    A: List = [None] * nb                    # IA blocks [3,3,N]
    B: List = [None] * nb
    D: List = [None] * nb
    pA_n: List = [None] * nb                 # bias force (angular) [3,N]
    pA_f: List = [None] * nb

    zero3 = jnp.zeros((3, N), f32)
    for i in range(nb):
        w_b[i] = m33_T_vec(W[i], omega[i])
        v_b[i] = m33_T_vec(W[i], vel[i])
        if i == 0:
            c_n[i] = zero3
            c_f[i] = zero3
        else:
            di = i - 1
            wJ = jnp.asarray(fc.axis[i], f32)[:, None] * qd[di][None, :]
            c_n[i] = vcross(w_b[i], wJ)
            c_f[i] = vcross(v_b[i], wJ)

        A[i] = jnp.broadcast_to(jnp.asarray(fc.IA_A[i], f32)[:, :, None], (3, 3, N))
        B[i] = jnp.broadcast_to(jnp.asarray(fc.IA_B[i], f32)[:, :, None], (3, 3, N))
        D[i] = jnp.broadcast_to(jnp.asarray(fc.IA_D[i], f32)[:, :, None], (3, 3, N))

        # I v with constant blocks
        Iv_n = c_mul_m33_vec(fc.IA_A[i], w_b[i], f32) + c_mul_m33_vec(
            fc.IA_B[i], v_b[i], f32
        )
        Iv_f = cT_mul_m33_vec(fc.IA_B[i], w_b[i], f32) + float(fc.mass[i]) * v_b[i]
        bias_n = vcross(w_b[i], Iv_n) + vcross(v_b[i], Iv_f)
        bias_f = vcross(w_b[i], Iv_f)
        ext_n = m33_T_vec(W[i], n_w[i])
        ext_f = m33_T_vec(W[i], f_w[i])
        pA_n[i] = bias_n - ext_n
        pA_f[i] = bias_f - ext_f

    # ----------------------------------------------------------- ABA pass 2
    U_t: List = [None] * nb
    U_b: List = [None] * nb
    d_inv: List = [None] * nb
    u_: List = [None] * nb

    kv_arr = kv  # [nd, 1] or [nd, N]; rows broadcast against [N] quantities
    for i in range(nb - 1, 0, -1):
        p = int(fc.parent[i])
        di = i - 1
        ax = fc.axis[i]

        Ut = m33_vec_c(A[i], ax)             # [3, N]
        Ub = m33_T_vec_c(B[i], ax)
        d = (
            (Ut * jnp.asarray(ax, f32)[:, None]).sum(0)
            + float(fc.armature[di])
            + dt * (float(fc.damping[di]) + kv_arr[di])
        )
        dinv = 1.0 / d
        u = tau[di] - (jnp.asarray(ax, f32)[:, None] * pA_n[i]).sum(0)
        U_t[i], U_b[i], d_inv[i], u_[i] = Ut, Ub, dinv, u

        # Ia = IA - U U^T / d (blocks)
        Ap = A[i] - Ut[:, None] * Ut[None] * dinv[None, None]
        Bp = B[i] - Ut[:, None] * Ub[None] * dinv[None, None]
        Dp = D[i] - Ub[:, None] * Ub[None] * dinv[None, None]

        # pa = pA + Ia c + U (u/d)
        pan = pA_n[i] + m33_vec(Ap, c_n[i]) + m33_vec(Bp, c_f[i]) + Ut * (u * dinv)[None]
        paf = (
            pA_f[i]
            + m33_T_vec(Bp, c_n[i])
            + m33_vec(Dp, c_f[i])
            + Ub * (u * dinv)[None]
        )

        # transform to parent coords: force n_p = M pan + r x (M paf); f_p = M paf
        Mi = M[i]
        Mpan = m33_vec(Mi, pan)
        Mpaf = m33_vec(Mi, paf)
        r = fc.r[i]
        pA_n[p] = pA_n[p] + Mpan + c_cross_vec(r, Mpaf)
        pA_f[p] = pA_f[p] + Mpaf

        # inertia: sandwich with X = [[E,0],[F,E]], E = Mi^T, F = -E r~
        rx = _const_skew(r)

        def sandwich(Z):
            return m33_mul(m33_mul(Mi, Z), jnp.swapaxes(Mi, 0, 1))

        Ah = sandwich(Ap)
        Bh = sandwich(Bp)
        Dh = sandwich(Dp)
        Bh_rx = m33_mul_c(Bh, rx)
        rx_Dh = c_mul_m33(rx, Dh)
        rx_Dh_rx = m33_mul_c(rx_Dh, rx)

        YA = Ah - Bh_rx - jnp.swapaxes(Bh_rx, 0, 1) - rx_Dh_rx
        YB = Bh + rx_Dh
        A[p] = A[p] + YA
        B[p] = B[p] + YB
        D[p] = D[p] + Dh

    # ----------------------------------------------------------- ABA pass 3
    a0 = _solve6(A[0], B[0], D[0], -jnp.concatenate([pA_n[0], pA_f[0]], axis=0))
    a_n: List = [None] * nb
    a_f: List = [None] * nb
    a_n[0], a_f[0] = a0[0:3], a0[3:6]

    qdd_rows: List = [None] * nd
    for i in range(1, nb):
        p = int(fc.parent[i])
        di = i - 1
        Mi = M[i]
        # X a_p: w' = Mi^T w ; v' = Mi^T (v - r x w)
        w_l = m33_T_vec(Mi, a_n[p]) + c_n[i]
        v_l = m33_T_vec(Mi, a_f[p] - c_cross_vec(fc.r[i], a_n[p])) + c_f[i]
        qdd_i = (u_[i] - (vdot(U_t[i], w_l) + vdot(U_b[i], v_l))) * d_inv[i]
        qdd_rows[di] = qdd_i
        a_n[i] = w_l + jnp.asarray(fc.axis[i], f32)[:, None] * qdd_i[None]
        a_f[i] = v_l
    qdd = jnp.stack(qdd_rows)                # [nd, N]

    # ------------------------------------------------------- integration
    W0 = W[0]
    wdot_w = m33_vec(W0, a_n[0])
    grav = jnp.asarray([0.0, 0.0, -params.gravity], f32)[:, None]
    a_lin_w = m33_vec(W0, a_f[0]) + grav + vcross(root_ang, root_vel)

    vmax = 100.0
    new_ang = jnp.clip(root_ang + dt * wdot_w, -vmax, vmax)
    new_vel = jnp.clip(root_vel + dt * a_lin_w, -vmax, vmax)
    new_pos = root_pos + dt * new_vel

    dq = rot.exp_map_to_quat((dt * new_ang).T)
    new_quat = rot.quat_normalize(rot.quat_mul(dq, root_quat.T))

    new_qd = jnp.clip(qd + dt * qdd, -vmax, vmax)
    new_q = q + dt * new_qd
    new_qd = jnp.where((new_q > hi_c) & (new_qd > 0), 0.0, new_qd)
    new_qd = jnp.where((new_q < lo_c) & (new_qd < 0), 0.0, new_qd)
    new_q = jnp.clip(new_q, lo_c, hi_c)

    new_state = SimState(
        root_pos=new_pos.T,
        root_quat=new_quat,
        root_vel=new_vel.T,
        root_ang_vel=new_ang.T,
        dof_pos=new_q.T,
        dof_vel=new_qd.T,
        pd_target=state.pd_target,
    )
    return new_state, contact.T              # [N, nb]


def c_mul_m33_vec(C, v, dtype):
    """const [3,3] @ [3,N] -> [3,N]."""
    return (jnp.asarray(C, dtype)[:, :, None] * v[None]).sum(1)


def cT_mul_m33_vec(C, v, dtype):
    """const [3,3]^T @ [3,N] -> [3,N]."""
    return (jnp.asarray(C, dtype)[:, :, None] * v[:, None]).sum(0)


def _solve6(A, B, D, rhs):
    """Solve [[A,B],[B^T,D]] x = rhs, blocks [3,3,N], rhs [6,N].

    Unrolled Cholesky on the stacked [6,6,N] matrix.
    """
    Mfull = jnp.concatenate(
        [
            jnp.concatenate([A, B], axis=1),
            jnp.concatenate([jnp.swapaxes(B, 0, 1), D], axis=1),
        ],
        axis=0,
    )                                         # [6, 6, N]

    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        ssum = Mfull[j, j]
        for k in range(j):
            ssum = ssum - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(ssum, 1e-9))
        inv_ljj = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            ssum = Mfull[i, j]
            for k in range(j):
                ssum = ssum - L[i][k] * L[j][k]
            L[i][j] = ssum * inv_ljj

    y = [None] * 6
    for i in range(6):
        ssum = rhs[i]
        for k in range(i):
            ssum = ssum - L[i][k] * y[k]
        y[i] = ssum / L[i][i]
    x = [None] * 6
    for i in range(5, -1, -1):
        ssum = y[i]
        for k in range(i + 1, 6):
            ssum = ssum - L[k][i] * x[k]
        x[i] = ssum / L[i][i]
    return jnp.stack(x)                       # [6, N]


def fused_step(fc: FusedModelConstants, params: EngineParams, state: SimState, pd_target):
    """Control step: PD clamp/slew + ``substeps`` fused substeps.

    Same contract as engine.step.
    """
    tgt = apply_pd_target(fc.model, params, state, pd_target)
    state = replace(state, pd_target=tgt)
    dt = params.ctrl_dt / params.substeps

    def body(s, _):
        s, contact = fused_substep(fc, params, s, dt)
        return s, contact

    state, contacts = jax.lax.scan(body, state, None, length=params.substeps)
    return state, contacts[-1]
