"""Fused physics substep in structure-of-arrays (SoA) form — the TPU hot path.

The reference-layout engine (physics/engine.py) keeps per-body tensors as
``[N, 6, 6]``; on TPU the minor (6, 6) dims are padded to (8, 128) tiles,
wasting ~28x memory/bandwidth and fragmenting the step into hundreds of tiny
kernels.  Here every scalar quantity is a flat ``[N]`` vector (env on the
minor axis) and all spatial algebra is unrolled into scalar-vector
expressions that XLA fuses into a handful of large VPU kernels.  Model
constants (local transforms, inertias, contact points) are Python floats
baked into the trace, so constant folding removes most structure.

Semantics are identical to engine.substep (same PD control, contacts,
implicit-damping ABA, semi-implicit Euler) — verified against it in
tests/test_fused_step.py.
"""

from __future__ import annotations

from dataclasses import replace
from typing import List

import numpy as np
import jax.numpy as jnp

import add_gym_tpu.mathx.rotations as rot
from add_gym_tpu.physics.engine import EngineParams, SimState, apply_pd_target
from add_gym_tpu.physics.model import PhysicsModel

# --------------------------------------------------------------------------
# tiny SoA helpers: vectors are Python lists of [N] jnp arrays (or floats)


def _v3(x, y, z):
    return [x, y, z]


def vadd(a, b):
    return [a[i] + b[i] for i in range(len(a))]


def vsub(a, b):
    return [a[i] - b[i] for i in range(len(a))]


def vscale(a, s):
    return [a[i] * s for i in range(len(a))]


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


def m33_vec(M, v):
    return [M[i][0] * v[0] + M[i][1] * v[1] + M[i][2] * v[2] for i in range(3)]


def m33_T_vec(M, v):
    return [M[0][i] * v[0] + M[1][i] * v[1] + M[2][i] * v[2] for i in range(3)]


def m33_mul(A, B):
    return [
        [sum(A[i][k] * B[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]


def m33_T(A):
    return [[A[j][i] for j in range(3)] for i in range(3)]


def m33_add(A, B):
    return [[A[i][j] + B[i][j] for j in range(3)] for i in range(3)]


def _const_skew(r):
    return np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])


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

        # contact points grouped per body
        self.cp_by_body: List[List[int]] = [[] for _ in range(nb)]
        for p_idx, b in enumerate(model.cp_body):
            self.cp_by_body[int(b)].append(p_idx)
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


def _quat_to_mat_soa(q):
    """wxyz quat [4 x [N]] -> 3x3 SoA matrix."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 2.0 / n
    return [
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ]


def fused_substep(fc: FusedModelConstants, params: EngineParams, state: SimState, dt):
    """One physics substep, SoA layout.  Returns (state, body_contact [N, nb])."""
    nb = fc.nb
    nd = fc.model.nd
    N = state.root_pos.shape[0]

    # unpack state into SoA
    root_pos = [state.root_pos[:, i] for i in range(3)]
    root_quat = [state.root_quat[:, i] for i in range(4)]
    root_vel = [state.root_vel[:, i] for i in range(3)]
    root_ang = [state.root_ang_vel[:, i] for i in range(3)]
    q = [state.dof_pos[:, i] for i in range(nd)]
    qd = [state.dof_vel[:, i] for i in range(nd)]
    tgt = [state.pd_target[:, i] for i in range(nd)]

    cos = [jnp.cos(qi) for qi in q]
    sin = [jnp.sin(qi) for qi in q]

    # ---------------------------------------------------------- FK + vel
    W = [None] * nb          # body->world rotations, SoA 3x3
    o = [None] * nb          # world origins
    omega = [None] * nb      # world angular velocity
    vel = [None] * nb        # world origin linear velocity
    M = [None] * nb          # joint-frame rotation parent->body (L @ J)

    W[0] = _quat_to_mat_soa(root_quat)
    o[0] = root_pos
    omega[0] = root_ang
    vel[0] = root_vel

    for i in range(1, nb):
        p = int(fc.parent[i])
        di = i - 1
        c, s = cos[di], sin[di]
        Mi = [
            [fc.C0[i][a][b] + c * fc.C1[i][a][b] + s * fc.C2[i][a][b] for b in range(3)]
            for a in range(3)
        ]
        M[i] = Mi
        W[i] = m33_mul(W[p], Mi)
        r_w = m33_vec(W[p], list(fc.r[i]))
        o[i] = vadd(o[p], r_w)
        ax_w = m33_vec(W[i], list(fc.axis[i]))
        omega[i] = vadd(omega[p], vscale(ax_w, qd[di]))
        vel[i] = vadd(vel[p], vcross(omega[p], r_w))

    # ---------------------------------------------------------- contacts
    omega_cap = 2.0 / params.contact_timeconst
    n_w = [[jnp.zeros(N)] * 3 for _ in range(nb)]  # world torque about origin
    f_w = [[jnp.zeros(N)] * 3 for _ in range(nb)]
    contact = [jnp.zeros(N) for _ in range(nb)]

    for b in range(nb):
        pts = fc.cp_by_body[b]
        if not pts:
            continue
        nw = [jnp.zeros(N)] * 3
        fw = [jnp.zeros(N)] * 3
        fn_sum = jnp.zeros(N)
        for pi in pts:
            rp = m33_vec(W[b], list(fc.cp_pos[pi]))
            x_z = o[b][2] + rp[2]
            v_pt = vadd(vel[b], vcross(omega[b], rp))
            phi = x_z - float(fc.cp_radius[pi])
            pen = jnp.maximum(-phi, 0.0)
            active = (phi < 0.0).astype(x_z.dtype)

            cm, cml, cms = (
                float(fc.cp_mass[pi]),
                float(fc.cp_mass_local[pi]),
                float(fc.cp_mass_stab[pi]),
            )
            if bool(fc.cp_explicit[pi]):
                k = cm * omega_cap * omega_cap
                b_damp = min(2.0 * params.contact_dampratio * cm * omega_cap, cml / float(dt))
                stick_m = cml
            else:
                k = min(cm * omega_cap * omega_cap, 0.25 * cms / float(dt) ** 2)
                b_damp = min(2.0 * params.contact_dampratio * cm * omega_cap, 0.5 * cms / float(dt))
                stick_m = cms
            fn = jnp.maximum(k * pen - b_damp * v_pt[2], 0.0) * active

            speed = jnp.sqrt(v_pt[0] * v_pt[0] + v_pt[1] * v_pt[1] + 1e-10)
            f_t_mag = jnp.minimum(params.friction_mu * fn, stick_m * speed / float(dt))
            scale = -f_t_mag / speed
            fp = [scale * v_pt[0], scale * v_pt[1], fn]
            fw = vadd(fw, fp)
            nw = vadd(nw, vcross(rp, fp))
            fn_sum = fn_sum + fn
        n_w[b] = nw
        f_w[b] = fw
        contact[b] = fn_sum

    # ------------------------------------------------------- joint torques
    tau = []
    k_lim = 400.0
    for di in range(nd):
        t_pd = params.kp[di] * (tgt[di] - q[di]) - params.kv[di] * qd[di]
        t_pd = jnp.clip(t_pd, -params.max_torque, params.max_torque)
        t = t_pd - float(fc.damping[di]) * qd[di] - float(fc.friction[di]) * jnp.tanh(
            qd[di] / 0.05
        )
        t = t + k_lim * jnp.maximum(float(fc.lo[di]) - q[di], 0.0)
        t = t - k_lim * jnp.maximum(q[di] - float(fc.hi[di]), 0.0)
        tau.append(t)

    # ----------------------------------------------------------- ABA pass 1
    # spatial velocity in body coords, bias forces, articulated inertia init
    v_sp = [None] * nb   # [w(3), v(3)] body coords
    c_sp = [None] * nb
    A = [None] * nb      # IA blocks (SoA 3x3; A,D symmetric)
    B = [None] * nb
    D = [None] * nb
    pA_n = [None] * nb   # bias force angular part
    pA_f = [None] * nb   # bias force linear part

    for i in range(nb):
        w_b = m33_T_vec(W[i], omega[i])
        v_b = m33_T_vec(W[i], vel[i])
        v_sp[i] = (w_b, v_b)

        if i == 0:
            c_sp[i] = ([0.0] * 3, [0.0] * 3)
        else:
            di = i - 1
            wJ = vscale(list(fc.axis[i]), qd[di])
            c_sp[i] = (vcross(w_b, wJ), vcross(v_b, wJ))

        A[i] = [[jnp.broadcast_to(jnp.float32(fc.IA_A[i][a][b]), (N,)) for b in range(3)] for a in range(3)]
        B[i] = [[jnp.broadcast_to(jnp.float32(fc.IA_B[i][a][b]), (N,)) for b in range(3)] for a in range(3)]
        D[i] = [[jnp.broadcast_to(jnp.float32(fc.IA_D[i][a][b]), (N,)) for b in range(3)] for a in range(3)]

        # I v  (constant blocks x velocity)
        Iv_n = vadd(m33_vec(fc.IA_A[i].tolist(), w_b), m33_vec(fc.IA_B[i].tolist(), v_b))
        Iv_f = vadd(m33_T_vec(fc.IA_B[i].tolist(), w_b), vscale(v_b, float(fc.mass[i])))
        # crf(v, Iv) = [w x n + v x f, w x f]
        bias_n = vadd(vcross(w_b, Iv_n), vcross(v_b, Iv_f))
        bias_f = vcross(w_b, Iv_f)
        # external force to body coords
        ext_n = m33_T_vec(W[i], n_w[i])
        ext_f = m33_T_vec(W[i], f_w[i])
        pA_n[i] = vsub(bias_n, ext_n)
        pA_f[i] = vsub(bias_f, ext_f)

    # ----------------------------------------------------------- ABA pass 2
    U_t = [None] * nb
    U_b = [None] * nb
    d_inv = [None] * nb
    u_ = [None] * nb

    for i in range(nb - 1, 0, -1):
        p = int(fc.parent[i])
        di = i - 1
        a_ax = list(fc.axis[i])

        Ut = m33_vec(A[i], a_ax)            # A @ axis
        Ub = m33_T_vec(B[i], a_ax)          # B^T @ axis
        d = vdot(a_ax, Ut) + float(fc.armature[di]) + float(dt) * (
            float(fc.damping[di]) + params.kv[di]
        )
        dinv = 1.0 / d
        u = tau[di] - vdot(a_ax, pA_n[i])
        U_t[i], U_b[i], d_inv[i], u_[i] = Ut, Ub, dinv, u

        # Ia = IA - U U^T / d   (blocks)
        Ap = [[A[i][a][b] - Ut[a] * Ut[b] * dinv for b in range(3)] for a in range(3)]
        Bp = [[B[i][a][b] - Ut[a] * Ub[b] * dinv for b in range(3)] for a in range(3)]
        Dp = [[D[i][a][b] - Ub[a] * Ub[b] * dinv for b in range(3)] for a in range(3)]

        # pa = pA + Ia c + U (u/d)
        cn, cf = c_sp[i]
        pan = vadd(vadd(pA_n[i], vadd(m33_vec(Ap, cn), m33_vec(Bp, cf))), vscale(Ut, u * dinv))
        paf = vadd(vadd(pA_f[i], vadd(m33_T_vec(Bp, cn), m33_vec(Dp, cf))), vscale(Ub, u * dinv))

        # transform into parent coords: E = M^T (child<-parent), so parent
        # quantities use M (body->parent rotation) directly.
        # force: n_p = M pan + r x (M paf); f_p = M paf
        Mi = M[i]
        Mpaf = m33_vec(Mi, paf)
        Mpan = m33_vec(Mi, pan)
        r = list(fc.r[i])
        pA_n[p] = vadd(pA_n[p], vadd(Mpan, vcross(r, Mpaf)))
        pA_f[p] = vadd(pA_f[p], Mpaf)

        # inertia: with X = [[E,0],[F,E]], E = Mi^T, F = -E r~
        # Y_A = E^T Ap E + E^T Bp F + (E^T Bp F)^T + F^T Dp F, etc.
        # Using E^T = Mi:  E^T Z E = Mi Z Mi^T for any block Z.
        # F = -Mi^T r~  =>  E^T Z F = -(Mi Z Mi^T) r~ ... compute via G = Mi Z
        rx = _const_skew(np.asarray(r)).tolist()

        def sandwich(Z):
            # Mi @ Z @ Mi^T
            G = m33_mul(Mi, Z)
            return m33_mul(G, m33_T(Mi))

        Ah = sandwich(Ap)                   # E^T Ap E
        Bh = sandwich(Bp)                   # E^T Bp E
        Dh = sandwich(Dp)                   # E^T Dp E
        # F = -E r~ => E^T Bp F = -Bh r~ ; F^T Dp F = r~ Dh r~ (note (E r~)^T)
        Bh_rx = m33_mul(Bh, rx)             # Bh @ r~
        rx_Dh = m33_mul(rx, Dh)
        rx_Dh_rx = m33_mul(rx_Dh, rx)

        YA = [[Ah[a][b] - Bh_rx[a][b] - Bh_rx[b][a] - rx_Dh_rx[a][b] for b in range(3)] for a in range(3)]
        YB = [[Bh[a][b] + rx_Dh[a][b] for b in range(3)] for a in range(3)]
        YD = Dh

        A[p] = m33_add(A[p], YA)
        B[p] = m33_add(B[p], YB)
        D[p] = m33_add(D[p], YD)

    # ----------------------------------------------------------- ABA pass 3
    # free base: solve IA0 a0 = -pA0 (6x6 SPD, unrolled Cholesky)
    a0 = _solve6(A[0], B[0], D[0], [ -x for x in pA_n[0] + pA_f[0] ])
    a_sp = [None] * nb
    a_sp[0] = (a0[:3], a0[3:])

    qdd = [None] * nd
    for i in range(1, nb):
        p = int(fc.parent[i])
        di = i - 1
        Mi = M[i]
        wa_p, va_p = a_sp[p]
        # X a_p: w' = E w = Mi^T w ; v' = E (v - r x w)
        w_l = m33_T_vec(Mi, wa_p)
        v_l = m33_T_vec(Mi, vsub(va_p, vcross(list(fc.r[i]), wa_p)))
        cn, cf = c_sp[i]
        w_l = vadd(w_l, cn)
        v_l = vadd(v_l, cf)
        qdd_i = (u_[i] - (vdot(U_t[i], w_l) + vdot(U_b[i], v_l))) * d_inv[i]
        qdd[di] = qdd_i
        a_sp[i] = (vadd(w_l, vscale(list(fc.axis[i]), qdd_i)), v_l)

    # ------------------------------------------------------- integration
    W0 = W[0]
    wdot_w = m33_vec(W0, a_sp[0][0])
    a_lin_w = vadd(
        m33_vec(W0, a_sp[0][1]),
        vadd([0.0, 0.0, -params.gravity], vcross(root_ang, root_vel)),
    )
    new_ang = [root_ang[i] + dt * wdot_w[i] for i in range(3)]
    new_vel = [root_vel[i] + dt * a_lin_w[i] for i in range(3)]
    new_pos = [root_pos[i] + dt * new_vel[i] for i in range(3)]

    vmax = 100.0
    new_ang = [jnp.clip(x, -vmax, vmax) for x in new_ang]
    new_vel = [jnp.clip(x, -vmax, vmax) for x in new_vel]

    ang_stack = jnp.stack(new_ang, axis=-1)
    dq = rot.exp_map_to_quat(dt * ang_stack)
    new_quat = rot.quat_normalize(rot.quat_mul(dq, jnp.stack(root_quat, -1)))

    new_qd, new_q = [], []
    for di in range(nd):
        v = jnp.clip(qd[di] + dt * qdd[di], -vmax, vmax)
        x = q[di] + dt * v
        lo, hi = float(fc.lo[di]), float(fc.hi[di])
        v = jnp.where((x > hi) & (v > 0), 0.0, v)
        v = jnp.where((x < lo) & (v < 0), 0.0, v)
        x = jnp.clip(x, lo, hi)
        new_qd.append(v)
        new_q.append(x)

    new_state = SimState(
        root_pos=jnp.stack(new_pos, -1),
        root_quat=new_quat,
        root_vel=jnp.stack(new_vel, -1),
        root_ang_vel=ang_stack,
        dof_pos=jnp.stack(new_q, -1),
        dof_vel=jnp.stack(new_qd, -1),
        pd_target=state.pd_target,
    )
    body_contact = jnp.stack(contact, axis=-1)
    return new_state, body_contact


def _solve6(A, B, D, rhs):
    """Solve the 6x6 SPD system [[A,B],[B^T,D]] x = rhs via unrolled Cholesky."""
    # assemble full 6x6 SoA
    Mfull = [[None] * 6 for _ in range(6)]
    for a in range(3):
        for b in range(3):
            Mfull[a][b] = A[a][b]
            Mfull[a][3 + b] = B[a][b]
            Mfull[3 + a][b] = B[b][a]
            Mfull[3 + a][3 + b] = D[a][b]

    # Cholesky M = L L^T (unrolled)
    L = [[None] * 6 for _ in range(6)]
    for j in range(6):
        ssum = Mfull[j][j]
        for k in range(j):
            ssum = ssum - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(ssum, 1e-9))
        inv_ljj = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            ssum = Mfull[i][j]
            for k in range(j):
                ssum = ssum - L[i][k] * L[j][k]
            L[i][j] = ssum * inv_ljj

    # forward/back substitution
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
    return x


def fused_step(fc: FusedModelConstants, params: EngineParams, state: SimState, pd_target):
    """Control step: PD clamp/slew + ``substeps`` fused substeps.

    Same contract as engine.step.
    """
    import jax

    tgt = apply_pd_target(fc.model, params, state, pd_target)
    state = replace(state, pd_target=tgt)
    dt = params.ctrl_dt / params.substeps

    def body(s, _):
        s, contact = fused_substep(fc, params, s, dt)
        return s, contact

    state, contacts = jax.lax.scan(body, state, None, length=params.substeps)
    return state, contacts[-1]
