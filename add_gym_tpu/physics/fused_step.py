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

from add_gym_tpu.physics.engine import EngineParams, SimState, apply_pd_target
from add_gym_tpu.physics.model import PhysicsModel

# --------------------------------------------------------------------------
# stacked helpers: rotations [3, 3, N], vectors [3, N]; constants are numpy
# [3, 3] / [3] and broadcast over the minor env axis.


# NOTE on constants: every model constant enters the math as a *Python
# float* (unrolled loops below), never as a jnp constant array.  This keeps
# the whole core legal inside a Pallas kernel (Mosaic rejects captured array
# constants) and lets XLA constant-fold aggressively.


def m33_mul(A, B):
    """[3,3,N] @ [3,3,N] -> [3,3,N]."""
    return (A[:, :, None] * B[None, :, :]).sum(1)


def m33_mul_c(A, C):
    """[3,3,N] @ const 3x3 (floats) -> [3,3,N]."""
    C = np.asarray(C)
    rows = [
        [sum(A[i, k] * float(C[k, j]) for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def c_mul_m33(C, B):
    """const 3x3 (floats) @ [3,3,N] -> [3,3,N]."""
    C = np.asarray(C)
    rows = [
        [sum(float(C[i, k]) * B[k, j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    return jnp.stack([jnp.stack(r) for r in rows])


def m33_vec(A, v):
    """[3,3,N] @ [3,N] -> [3,N]."""
    return (A * v[None, :, :]).sum(1)


def m33_T_vec(A, v):
    """[3,3,N]^T @ [3,N] -> [3,N]."""
    return (A * v[:, None, :]).sum(0)


def m33_vec_c(A, c):
    """[3,3,N] @ const 3-vector (floats) -> [3,N]."""
    c = np.asarray(c)
    return jnp.stack(
        [sum(A[i, k] * float(c[k]) for k in range(3)) for i in range(3)]
    )


def m33_T_vec_c(A, c):
    """[3,3,N]^T @ const 3-vector (floats) -> [3,N]."""
    c = np.asarray(c)
    return jnp.stack(
        [sum(A[k, i] * float(c[k]) for k in range(3)) for i in range(3)]
    )


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
    """const 3-vector (floats) x [3,N] -> [3,N]."""
    c0, c1, c2 = float(c[0]), float(c[1]), float(c[2])
    return jnp.stack(
        [
            c1 * b[2] - c2 * b[1],
            c2 * b[0] - c0 * b[2],
            c0 * b[1] - c1 * b[0],
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

        # self-collision spheres and tested pairs
        self.sc_body = np.asarray(model.sc_body, np.int32)
        self.sc_pos = np.asarray(model.sc_pos, np.float64)
        self.sc_radius = np.asarray(model.sc_radius, np.float64)
        self.sc_pairs = np.asarray(model.sc_pairs, np.int32)
        self.sc_stiff_mass = np.asarray(model.sc_stiff_mass, np.float64)

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


def _quat_update_stacked(root_quat, new_ang, dt):
    """q' = normalize(exp(dt * w) * q) in stacked [4,B]/[3,B] layout.

    Same semantics as rot.exp_map_to_quat + quat_mul + quat_normalize
    (mathx/rotations.py:145-207) without layout transposes.
    """
    ex, ey, ez = dt * new_ang[0], dt * new_ang[1], dt * new_ang[2]
    angle = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    inv = 1.0 / jnp.maximum(angle, 1e-8)
    small = angle <= 1e-5
    half = 0.5 * jnp.where(small, 0.0, angle)
    s = jnp.sin(half) * inv
    dw = jnp.cos(half)
    dx = jnp.where(small, 0.0, ex * s)
    dy = jnp.where(small, 0.0, ey * s)
    dz = jnp.where(small, 0.0, ez * s)

    w2, x2, y2, z2 = root_quat
    w = dw * w2 - dx * x2 - dy * y2 - dz * z2
    x = dw * x2 + dx * w2 + dy * z2 - dz * y2
    y = dw * y2 - dx * z2 + dy * w2 + dz * x2
    z = dw * z2 + dx * y2 - dy * x2 + dz * w2
    # positive hemisphere + renormalize
    sign = jnp.where(w < 0, -1.0, 1.0)
    n = 1.0 / jnp.sqrt(jnp.maximum(w * w + x * x + y * y + z * z, 1e-12))
    return jnp.stack([w * sign * n, x * sign * n, y * sign * n, z * sign * n])


def _fk_stacked(fc, root_pos, root_quat, root_vel, root_ang, qd, cos, sin):
    """Stacked forward kinematics + velocity propagation.

    Returns per-body lists: W [3,3,N] body->world rotations, o [3,N] world
    origins, omega/vel [3,N] world angular / origin linear velocities,
    M [3,3,N] parent->body joint rotations.
    """
    nb = fc.nb
    W: List = [None] * nb
    o: List = [None] * nb
    omega: List = [None] * nb
    vel: List = [None] * nb
    M: List = [None] * nb

    W[0] = _quat_to_mat_T(root_quat)
    o[0] = root_pos
    omega[0] = root_ang
    vel[0] = root_vel

    for i in range(1, nb):
        p = int(fc.parent[i])
        di = i - 1
        c, s = cos[di], sin[di]
        C0, C1, C2 = fc.C0[i], fc.C1[i], fc.C2[i]
        Mi = jnp.stack(
            [
                jnp.stack(
                    [
                        float(C0[a, b]) + c * float(C1[a, b]) + s * float(C2[a, b])
                        for b in range(3)
                    ]
                )
                for a in range(3)
            ]
        )
        M[i] = Mi
        W[i] = m33_mul(W[p], Mi)
        r_w = m33_vec_c(W[p], fc.r[i])
        o[i] = o[p] + r_w
        ax_w = m33_vec_c(W[i], fc.axis[i])
        omega[i] = omega[p] + ax_w * qd[di][None, :]
        vel[i] = vel[p] + vcross(omega[p], r_w)
    return W, o, omega, vel, M


def _sc_forces_stacked(fc: FusedModelConstants, params: EngineParams, dt, W, o, omega, vel):
    """Self-collision penalty forces on stacked FK results.

    Returns {body: (n [3,N], f [3,N])} world torque/force contributions.
    Per-pair unrolled with float constants (kernel-safe); same force model
    as engine.self_collision_forces.
    """
    omega_sc = 2.0 / params.contact_timeconst
    f32 = o[0].dtype
    sph_r: dict = {}
    sph_x: dict = {}
    sph_v: dict = {}

    def _sphere(si: int):
        if si in sph_x:
            return
        b = int(fc.sc_body[si])
        r_sp = m33_vec_c(W[b], fc.sc_pos[si])
        sph_r[si] = r_sp
        sph_x[si] = o[b] + r_sp
        sph_v[si] = vel[b] + vcross(omega[b], r_sp)

    out: dict = {}

    def _add(b, n_c, f_c):
        if b in out:
            n0, f0 = out[b]
            out[b] = (n0 + n_c, f0 + f_c)
        else:
            out[b] = (n_c, f_c)

    for qq in range(len(fc.sc_pairs)):
        sa, sb = int(fc.sc_pairs[qq, 0]), int(fc.sc_pairs[qq, 1])
        _sphere(sa)
        _sphere(sb)
        d = sph_x[sa] - sph_x[sb]                       # [3, N]
        dist = jnp.sqrt(vdot(d, d) + 1e-12)
        pen = float(fc.sc_radius[sa] + fc.sc_radius[sb]) - dist
        active = (pen > 0.0).astype(f32)
        n_dir = d / dist[None]
        vn = vdot(sph_v[sa] - sph_v[sb], n_dir)

        m = float(fc.sc_stiff_mass[qq])
        k_sc = min(m * omega_sc * omega_sc, 0.25 * m / (dt * dt))
        b_sc = min(2.0 * m * omega_sc, 0.5 * m / dt)
        fmag = jnp.maximum(k_sc * pen - b_sc * vn, 0.0) * active
        f_sc = n_dir * fmag[None]

        ba, bb = int(fc.sc_body[sa]), int(fc.sc_body[sb])
        _add(ba, vcross(sph_r[sa], f_sc), f_sc)
        _add(bb, -vcross(sph_r[sb], f_sc), -f_sc)
    return out


def _substep_core(
    fc: FusedModelConstants,
    params: EngineParams,
    kp,          # [nd, 1] or [nd, B]
    kv,          # [nd, 1] or [nd, B]
    mu,          # scalar or [B]
    dof_tables,  # (damping, friction, lo, hi), each [nd, 1] or [nd, B]
    dt,
    root_pos,    # [3, B]
    root_quat,   # [4, B]
    root_vel,    # [3, B]
    root_ang,    # [3, B]
    q,           # [nd, B]
    qd,          # [nd, B]
    tgt,         # [nd, B]
    vectorized_contacts: bool = False,
    sc_ext=None,  # {body: (n [3,B], f [3,B])} held self-collision forces
    ms=None,      # [B] per-env mass/inertia scale (None = 1, zero cost)
):
    """One physics substep on stacked env-minor arrays.

    Pure stacked math, kernel-safe (model constants enter as Python floats,
    never as jnp constant arrays) — shared between the XLA path
    (fused_substep) and the Pallas megakernel (physics/pallas_step.py).
    ``vectorized_contacts`` selects the [P,3,N]-batched contact formulation
    (faster under XLA, uses constant arrays so kernel-incompatible) over the
    per-point float-constant loop (Pallas-safe).
    Returns (root_pos, root_quat, root_vel, root_ang, q, qd, contact [nb, B]).
    """
    nb = fc.nb
    nd = fc.model.nd
    # env axis: either 1-D [..., N] (XLA fused path) or 2-D [..., S, L]
    # (Pallas sublane-tiled layout, physics/pallas_step.py) — every op
    # below is elementwise/broadcast over the trailing env dims
    eshape = root_pos.shape[1:]
    f32 = root_pos.dtype

    cos = jnp.cos(q)                       # [nd, *eshape]
    sin = jnp.sin(q)

    # ---------------------------------------------------------- FK + vel
    W, o, omega, vel, M = _fk_stacked(
        fc, root_pos, root_quat, root_vel, root_ang, qd, cos, sin
    )

    # ---------------------------------------------------------- contacts
    # per-body point groups with constant point arrays: avoids gathers and
    # scatters entirely (keeps the math Pallas/Mosaic-compatible and lets
    # XLA fuse the contact chain into the FK chain)
    k_all, b_all, stick_all = fc.contact_gains(params, float(dt))
    zero3 = jnp.zeros((3,) + eshape, f32)
    zero1 = jnp.zeros(eshape, f32)
    one = jnp.ones(eshape, f32)
    n_w: List = [zero3] * nb                 # world torque about origin
    f_w: List = [zero3] * nb
    contact_l: List = [zero1] * nb

    cpb = fc.cp_body
    for b in range(nb):
        pts = np.where(cpb == b)[0]
        if pts.size == 0:
            continue
        if vectorized_contacts:
            cp = jnp.asarray(fc.cp_pos[pts], f32)            # [P, 3] const
            # rp[p, j, n] = sum_k W[b][j, k, n] * cp[p, k]
            rp = (W[b][None] * cp[:, None, :, None]).sum(2)  # [P, 3, N]
            x_z = o[b][2][None, :] + rp[:, 2]                # [P, N]
            om = omega[b][None]                              # [1, 3, N]
            v_pt = vel[b][None] + jnp.stack(
                [
                    om[:, 1] * rp[:, 2] - om[:, 2] * rp[:, 1],
                    om[:, 2] * rp[:, 0] - om[:, 0] * rp[:, 2],
                    om[:, 0] * rp[:, 1] - om[:, 1] * rp[:, 0],
                ],
                axis=1,
            )                                                # [P, 3, N]

            phi = x_z - jnp.asarray(fc.cp_radius[pts], f32)[:, None]
            pen = jnp.maximum(-phi, 0.0)
            active = (phi < 0.0).astype(f32)
            fn = jnp.maximum(
                jnp.asarray(k_all[pts])[:, None] * pen
                - jnp.asarray(b_all[pts])[:, None] * v_pt[:, 2],
                0.0,
            ) * active                                       # [P, N]

            speed = jnp.sqrt(v_pt[:, 0] ** 2 + v_pt[:, 1] ** 2 + 1e-10)
            f_t_mag = jnp.minimum(
                mu * fn, jnp.asarray(stick_all[pts])[:, None] * speed / dt
            )
            scale = -f_t_mag / speed
            f_pt = jnp.stack(
                [scale * v_pt[:, 0], scale * v_pt[:, 1], fn], axis=1
            )                                                # [P, 3, N]
            n_pt = jnp.stack(
                [
                    rp[:, 1] * f_pt[:, 2] - rp[:, 2] * f_pt[:, 1],
                    rp[:, 2] * f_pt[:, 0] - rp[:, 0] * f_pt[:, 2],
                    rp[:, 0] * f_pt[:, 1] - rp[:, 1] * f_pt[:, 0],
                ],
                axis=1,
            )
            f_w[b] = f_pt.sum(0)                             # [3, N]
            n_w[b] = n_pt.sum(0)
            contact_l[b] = fn.sum(0)                         # [N]
            continue
        Wb = W[b]
        oz = o[b][2]
        omx, omy, omz = omega[b][0], omega[b][1], omega[b][2]
        vx, vy, vz = vel[b][0], vel[b][1], vel[b][2]

        fx_acc = fy_acc = fz_acc = None
        nx_acc = ny_acc = nz_acc = None
        for pi in pts:
            cx, cy, cz = (float(v) for v in fc.cp_pos[pi])
            rx = Wb[0, 0] * cx + Wb[0, 1] * cy + Wb[0, 2] * cz
            ry = Wb[1, 0] * cx + Wb[1, 1] * cy + Wb[1, 2] * cz
            rz = Wb[2, 0] * cx + Wb[2, 1] * cy + Wb[2, 2] * cz
            x_z = oz + rz
            vpx = vx + omy * rz - omz * ry
            vpy = vy + omz * rx - omx * rz
            vpz = vz + omx * ry - omy * rx

            phi = x_z - float(fc.cp_radius[pi])
            pen = jnp.maximum(-phi, 0.0)
            active = (phi < 0.0).astype(f32)
            fn = jnp.maximum(
                float(k_all[pi]) * pen - float(b_all[pi]) * vpz, 0.0
            ) * active

            speed = jnp.sqrt(vpx * vpx + vpy * vpy + 1e-10)
            f_t_mag = jnp.minimum(
                mu * fn, (float(stick_all[pi]) / dt) * speed
            )
            scale = -f_t_mag / speed
            fx, fy, fz = scale * vpx, scale * vpy, fn
            nx = ry * fz - rz * fy
            ny = rz * fx - rx * fz
            nz = rx * fy - ry * fx
            if fx_acc is None:
                fx_acc, fy_acc, fz_acc = fx, fy, fz
                nx_acc, ny_acc, nz_acc = nx, ny, nz
            else:
                fx_acc, fy_acc, fz_acc = fx_acc + fx, fy_acc + fy, fz_acc + fz
                nx_acc, ny_acc, nz_acc = nx_acc + nx, ny_acc + ny, nz_acc + nz
            contact_l[b] = contact_l[b] + fn
        f_w[b] = jnp.stack([fx_acc, fy_acc, fz_acc])     # [3, N]
        n_w[b] = jnp.stack([nx_acc, ny_acc, nz_acc])
    if ms is not None:
        # contact springs are mass-proportional (cp_mass-derived constants):
        # a heavier robot presses and is caught proportionally harder, so
        # penetration depths stay mass-invariant
        contact_l = [c * ms for c in contact_l]
    contact = jnp.stack(contact_l)                       # [nb, N]

    # ---------------------------------------------- self-collision (held)
    # penalty forces from curated sphere pairs, evaluated once per control
    # step (fused_step / pallas_step) and held constant across substeps —
    # they vary slowly relative to the 400 Hz substep rate
    if sc_ext is not None:
        for b, (n_c, f_c) in sc_ext.items():
            n_w[b] = n_w[b] + n_c
            f_w[b] = f_w[b] + f_c
    if ms is not None:
        # ground + self-collision penalty forces scale with body mass
        # (same invariant-penetration argument as the contact spring)
        n_w = [n * ms for n in n_w]
        f_w = [f * ms for f in f_w]

    # ------------------------------------------------------- joint torques
    t_pd = jnp.clip(kp * (tgt - q) - kv * qd, -params.max_torque, params.max_torque)
    damping_c, friction_c, lo_c, hi_c = dof_tables
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

    for i in range(nb):
        w_b[i] = m33_T_vec(W[i], omega[i])
        v_b[i] = m33_T_vec(W[i], vel[i])
        if i == 0:
            c_n[i] = zero3
            c_f[i] = zero3
        else:
            di = i - 1
            ax = fc.axis[i]
            wJ = jnp.stack([float(ax[k]) * qd[di] for k in range(3)])
            c_n[i] = vcross(w_b[i], wJ)
            c_f[i] = vcross(v_b[i], wJ)

        # per-env mass scale rides in the lift row: blocks become ms*I
        lift = one if ms is None else ms
        A[i] = _lift_const_mat(fc.IA_A[i], lift)
        B[i] = _lift_const_mat(fc.IA_B[i], lift)
        D[i] = _lift_const_mat(fc.IA_D[i], lift)

        # I v with constant blocks
        Iv_n = c_mul_m33_vec(fc.IA_A[i], w_b[i]) + c_mul_m33_vec(
            fc.IA_B[i], v_b[i]
        )
        Iv_f = cT_mul_m33_vec(fc.IA_B[i], w_b[i]) + float(fc.mass[i]) * v_b[i]
        bias_n = vcross(w_b[i], Iv_n) + vcross(v_b[i], Iv_f)
        bias_f = vcross(w_b[i], Iv_f)
        if ms is not None:
            bias_n = bias_n * ms
            bias_f = bias_f * ms
        ext_n = m33_T_vec(W[i], n_w[i])
        ext_f = m33_T_vec(W[i], f_w[i])
        pA_n[i] = bias_n - ext_n
        pA_f[i] = bias_f - ext_f

    # ----------------------------------------------------------- ABA pass 2
    U_t: List = [None] * nb
    U_b: List = [None] * nb
    d_inv: List = [None] * nb
    u_: List = [None] * nb

    for i in range(nb - 1, 0, -1):
        p = int(fc.parent[i])
        di = i - 1
        ax = fc.axis[i]

        Ut = m33_vec_c(A[i], ax)             # [3, N]
        Ub = m33_T_vec_c(B[i], ax)
        d = (
            sum(Ut[k] * float(ax[k]) for k in range(3))
            + float(fc.armature[di])
            + dt * (float(fc.damping[di]) + kv[di])
        )
        dinv = 1.0 / d
        u = tau[di] - sum(float(ax[k]) * pA_n[i][k] for k in range(3))
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
        ax3 = fc.axis[i]
        a_n[i] = w_l + jnp.stack([float(ax3[k]) * qdd_i for k in range(3)])
        a_f[i] = v_l
    qdd = jnp.stack(qdd_rows)                # [nd, N]

    # ------------------------------------------------------- integration
    W0 = W[0]
    wdot_w = m33_vec(W0, a_n[0])
    a_lin = m33_vec(W0, a_f[0]) + vcross(root_ang, root_vel)
    a_lin_w = jnp.stack([a_lin[0], a_lin[1], a_lin[2] - params.gravity])

    vmax = 100.0
    new_ang = jnp.clip(root_ang + dt * wdot_w, -vmax, vmax)
    new_vel = jnp.clip(root_vel + dt * a_lin_w, -vmax, vmax)
    new_pos = root_pos + dt * new_vel
    new_quat = _quat_update_stacked(root_quat, new_ang, dt)

    new_qd = jnp.clip(qd + dt * qdd, -vmax, vmax)
    new_q = q + dt * new_qd
    new_qd = jnp.where((new_q > hi_c) & (new_qd > 0), 0.0, new_qd)
    new_qd = jnp.where((new_q < lo_c) & (new_qd < 0), 0.0, new_qd)
    new_q = jnp.clip(new_q, lo_c, hi_c)

    return new_pos, new_quat, new_vel, new_ang, new_q, new_qd, contact


def _prep_params(fc: FusedModelConstants, params: EngineParams, dtype=jnp.float32):
    """Transpose per-env (DR) or shared gains into stacked layout."""
    kp = jnp.asarray(params.kp, dtype)
    kp = kp.T if kp.ndim == 2 else kp[:, None]
    kv = jnp.asarray(params.kv, dtype)
    kv = kv.T if kv.ndim == 2 else kv[:, None]
    mu = jnp.asarray(params.friction_mu, dtype)
    return kp, kv, mu


def _prep_mass(params: EngineParams, dtype=jnp.float32):
    """Per-env mass scale [N] for the substep core, or None when disabled."""
    from add_gym_tpu.physics.engine import mass_scale_or_none

    return mass_scale_or_none(params, dtype)


def _dof_tables(fc: FusedModelConstants, dtype=jnp.float32):
    """Per-dof model tables in stacked layout [nd, 1]."""
    return (
        jnp.asarray(fc.damping, dtype)[:, None],
        jnp.asarray(fc.friction, dtype)[:, None],
        jnp.asarray(fc.lo, dtype)[:, None],
        jnp.asarray(fc.hi, dtype)[:, None],
    )


def fused_substep(fc: FusedModelConstants, params: EngineParams, state: SimState, dt):
    """One physics substep, stacked env-minor layout.

    Returns (state, body_contact [N, nb]).
    """
    kp, kv, mu = _prep_params(fc, params, state.root_pos.dtype)
    ms = _prep_mass(params, state.root_pos.dtype)
    tables = _dof_tables(fc, state.root_pos.dtype)
    sc_ext = merge_ext(
        compute_sc_ext(fc, params, dt, state),
        compute_np_ext(fc, params, dt, state),
    )
    rp, rq, rv, ra, q, qd, contact = _substep_core(
        fc, params, kp, kv, mu, tables, dt,
        state.root_pos.T, state.root_quat.T, state.root_vel.T,
        state.root_ang_vel.T, state.dof_pos.T, state.dof_vel.T,
        state.pd_target.T,
        vectorized_contacts=True,
        sc_ext=sc_ext,
        ms=ms,
    )
    new_state = SimState(
        root_pos=rp.T,
        root_quat=rq.T,
        root_vel=rv.T,
        root_ang_vel=ra.T,
        dof_pos=q.T,
        dof_vel=qd.T,
        pd_target=state.pd_target,
    )
    return new_state, contact.T              # [N, nb]


def c_mul_m33_vec(C, v):
    """const 3x3 (floats) @ [3,N] -> [3,N]."""
    C = np.asarray(C)
    return jnp.stack(
        [sum(float(C[i, k]) * v[k] for k in range(3)) for i in range(3)]
    )


def cT_mul_m33_vec(C, v):
    """const 3x3^T (floats) @ [3,N] -> [3,N]."""
    C = np.asarray(C)
    return jnp.stack(
        [sum(float(C[k, i]) * v[k] for k in range(3)) for i in range(3)]
    )


def _lift_const_mat(C, one):
    """const 3x3 (floats) -> [3,3,N] via scaling the ones row (kernel-safe:
    no captured constant arrays)."""
    C = np.asarray(C)
    return jnp.stack(
        [jnp.stack([float(C[a, b]) * one for b in range(3)]) for a in range(3)]
    )


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

    kp, kv, mu = _prep_params(fc, params, state.root_pos.dtype)
    ms = _prep_mass(params, state.root_pos.dtype)
    tables = _dof_tables(fc, state.root_pos.dtype)
    sc_ext = merge_ext(
        compute_sc_ext(fc, params, dt, state),
        compute_np_ext(fc, params, dt, state),
    )

    def body(s, _):
        rp, rq, rv, ra, q, qd, contact = _substep_core(
            fc, params, kp, kv, mu, tables, dt,
            s.root_pos.T, s.root_quat.T, s.root_vel.T, s.root_ang_vel.T,
            s.dof_pos.T, s.dof_vel.T, s.pd_target.T,
            vectorized_contacts=True,
            sc_ext=sc_ext,
            ms=ms,
        )
        s2 = SimState(
            root_pos=rp.T, root_quat=rq.T, root_vel=rv.T, root_ang_vel=ra.T,
            dof_pos=q.T, dof_vel=qd.T, pd_target=s.pd_target,
        )
        return s2, contact.T

    state, contacts = jax.lax.scan(body, state, None, length=params.substeps)
    return state, contacts[-1]


def compute_sc_ext(fc: FusedModelConstants, params: EngineParams, dt, state: SimState):
    """Held self-collision forces for a control step (or None)."""
    if not params.self_collision or not len(fc.sc_pairs):
        return None
    q = state.dof_pos.T
    W, o, omega, vel, _ = _fk_stacked(
        fc, state.root_pos.T, state.root_quat.T, state.root_vel.T,
        state.root_ang_vel.T, state.dof_vel.T, jnp.cos(q), jnp.sin(q),
    )
    return _sc_forces_stacked(fc, params, dt, W, o, omega, vel)


def compute_np_ext(fc: FusedModelConstants, params: EngineParams, dt, state: SimState):
    """Held capsule/geom narrowphase forces as stacked per-body wrenches.

    Evaluates the engine path's vectorized narrowphase (one source of
    truth: engine.narrowphase_f_ext over [N, nb] FK — hundreds of pairs
    would explode the per-pair-unrolled stacked style) and converts the
    [N, nb, 6] wrench to the ``sc_ext`` dict format consumed by
    ``_substep_core``.  Returns {body: (n [3, N], f [3, N])} or None.
    XLA-path only: uses constant arrays, kernel-incompatible.
    """
    model = fc.model
    caps = model.capsules
    geoms = model.geoms
    has_caps = caps is not None and caps.num_pairs
    has_geoms = geoms is not None and geoms.num_pairs
    if not has_caps and not has_geoms:
        return None
    from add_gym_tpu.physics.engine import (
        _body_world_velocities,
        forward_kinematics,
        narrowphase_f_ext,
    )

    body_pos, body_rot = forward_kinematics(model, state)
    omega_w, v_origin_w = _body_world_velocities(model, state, body_rot)
    f_ext = narrowphase_f_ext(
        model, params, body_pos, body_rot, omega_w, v_origin_w, dt
    )                                                        # [N, nb, 6]

    # static set of bodies any pair table can touch
    touched: list = []
    if has_caps:
        touched.append(caps.body[caps.pairs.ravel()])
    if has_geoms:
        touched.append(geoms.seg_body[geoms.ss_pairs.ravel()])
        if geoms.sb_pairs.size:
            touched.append(geoms.seg_body[geoms.sb_pairs[:, 0]])
            touched.append(geoms.box_body[geoms.sb_pairs[:, 1]])
        if geoms.bb_pairs.size:
            touched.append(geoms.box_body[geoms.bb_pairs.ravel()])
    bodies = np.unique(np.concatenate(touched)) if touched else np.zeros(0)
    return {
        int(b): (f_ext[:, int(b), 0:3].T, f_ext[:, int(b), 3:6].T)
        for b in bodies
    }


def merge_ext(a, b):
    """Merge two {body: (n, f)} held-force dicts (either may be None)."""
    if a is None:
        return b
    if b is None:
        return a
    out = dict(a)
    for k, (n_c, f_c) in b.items():
        if k in out:
            n0, f0 = out[k]
            out[k] = (n0 + n_c, f0 + f_c)
        else:
            out[k] = (n_c, f_c)
    return out
