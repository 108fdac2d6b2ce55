"""TPU-native batched physics engine: state, FK, contacts, PD, integration.

Functional replacement for the reference's engine layer
(``add_gym/engine/base_engine.py`` ABCs + genesis/mjwarp backends): one
``SimState`` pytree ``[N, ...]`` and a pure ``step(model, params, state,
pd_target) -> (state, info)`` that fuses PD control, contact forces,
articulated dynamics (ABA) and semi-implicit Euler over ``substeps``
physics substeps per control step (mjwarp_engine.py:1554-1607 semantics).

Everything is shape-static and jit/scan/vmap-safe; resets are masked
``where`` updates (no host round-trips, unlike the reference's CPU contact
decode — SURVEY.md §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

import add_gym_tpu.mathx.rotations as rot
from add_gym_tpu.physics import spatial as sp
from add_gym_tpu.physics.aba import aba, _local_rot_mats
from add_gym_tpu.physics.model import PhysicsModel


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SimState:
    """Batched simulation state.  All arrays lead with the env axis N.

    Root velocities are world-frame (linear velocity of the root origin and
    angular velocity), matching the reference's ``get_vel``/``get_ang``
    exposure (base_engine.py:150-170, robot.py:286-296).
    """

    root_pos: jnp.ndarray      # [N, 3]
    root_quat: jnp.ndarray     # [N, 4] wxyz
    root_vel: jnp.ndarray      # [N, 3]
    root_ang_vel: jnp.ndarray  # [N, 3]
    dof_pos: jnp.ndarray       # [N, nd]
    dof_vel: jnp.ndarray       # [N, nd]
    pd_target: jnp.ndarray     # [N, nd] previous PD target (slew limiting)

    @property
    def num_envs(self):
        return self.root_pos.shape[0]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EngineParams:
    """Control/contact parameters (data pytree; safe to vary without recompile
    where shapes allow).  Scalar knobs that change compilation (substeps, dt)
    are static."""

    kp: jnp.ndarray                 # [nd] or [N, nd] (domain randomization)
    kv: jnp.ndarray                 # [nd] or [N, nd]
    ctrl_dt: float = field(metadata=dict(static=True), default=0.01)
    substeps: int = field(metadata=dict(static=True), default=4)
    max_torque: float = field(metadata=dict(static=True), default=200.0)
    max_target_delta: float = field(metadata=dict(static=True), default=0.5)
    position_limit_margin: float = field(metadata=dict(static=True), default=1e-4)
    # contact model (normal spring-damper per unit effective mass)
    contact_timeconst: float = field(metadata=dict(static=True), default=0.02)
    contact_dampratio: float = field(metadata=dict(static=True), default=1.0)
    # friction is a data leaf (scalar or [N] per-env) so domain randomization
    # does not trigger recompiles
    friction_mu: jnp.ndarray | float = 1.0
    # whole-body mass/inertia multiplier (scalar or [N] per-env).  Scales
    # spatial inertias, velocity bias forces and contact forces; gravity
    # (an acceleration) and motor-side constants (armature, joint damping,
    # PD torque limits) correctly do NOT scale — a heavier robot under the
    # same actuators is the sim2real axis.  Per-env values ride into the
    # Pallas kernel as one extra [1, N] input (pallas_step use_ms).
    mass_scale: jnp.ndarray | float = 1.0
    friction_vslip: float = field(metadata=dict(static=True), default=0.05)
    gravity: float = field(metadata=dict(static=True), default=9.81)
    # sphere-sphere self-collision on the model's curated pairs
    # (ref env.py:66-72 enable_self_collision)
    self_collision: bool = field(metadata=dict(static=True), default=True)


def default_state(model: PhysicsModel, num_envs: int, dtype=jnp.float32) -> SimState:
    zeros = lambda *s: jnp.zeros((num_envs,) + s, dtype)
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (num_envs, 1))
    return SimState(
        root_pos=zeros(3),
        root_quat=quat,
        root_vel=zeros(3),
        root_ang_vel=zeros(3),
        dof_pos=zeros(model.nd),
        dof_vel=zeros(model.nd),
        pd_target=zeros(model.nd),
    )


# ------------------------------------------------------------------------- FK


def joint_rot_mats(model: PhysicsModel, dof_pos):
    """Per-joint rotation matrices from hinge angles: [N, nb-1, 3, 3]."""
    axes = jnp.asarray(model.joint_axis[1:], dof_pos.dtype)   # [nb-1, 3]
    angle = dof_pos                                            # [N, nb-1]
    c = jnp.cos(angle)[..., None, None]
    s = jnp.sin(angle)[..., None, None]
    K = sp.skew(axes)                                          # [nb-1, 3, 3]
    KK = K @ K
    eye = jnp.eye(3, dtype=dof_pos.dtype)
    return eye + s * K + (1.0 - c) * KK                        # Rodrigues


def forward_kinematics(model: PhysicsModel, state: SimState):
    """World pose of every body: (pos [N, nb, 3], rot [N, nb, 3, 3])."""
    f32 = state.root_pos.dtype
    local_pos = jnp.asarray(model.local_pos, f32)
    L = _local_rot_mats(model, f32)                            # [nb, 3, 3]
    J = joint_rot_mats(model, state.dof_pos)                   # [N, nb-1, 3, 3]

    W0 = rot.quat_to_matrix(state.root_quat)                   # [N, 3, 3]
    pos = [state.root_pos]
    W = [W0]
    for i in range(1, model.nb):
        p = int(model.parent[i])
        Wi = W[p] @ (L[i] @ J[:, i - 1])
        oi = pos[p] + jnp.einsum("nij,j->ni", W[p], local_pos[i])
        W.append(Wi)
        pos.append(oi)
    return jnp.stack(pos, axis=1), jnp.stack(W, axis=1)


# -------------------------------------------------------------------- contacts


def contact_forces(
    model: PhysicsModel, params: EngineParams, body_pos, body_rot, state, dt
):
    """Point-vs-ground-plane compliant contacts.

    Returns (f_ext_w [N, nb, 6] spatial forces about each body origin in
    world coords, body_contact [N, nb] normal-force indicator).

    Normal: critically-damped spring (effective-mass scaled) with stiffness
    from ``contact_timeconst`` — MuJoCo solref-style (.02, 1).
    Friction: Coulomb cone with an *impulse clamp*: the tangential force
    never exceeds what would reverse the slip velocity within one substep
    (m_eff |v_t| / dt), which makes stiction unconditionally stable without
    viscous creep.
    """
    f32 = body_pos.dtype
    cp_body = model.cp_body                                    # [P]
    cp_pos = jnp.asarray(model.cp_pos, f32)                    # [P, 3]
    cp_radius = jnp.asarray(model.cp_radius, f32)              # [P]
    cp_mass = jnp.asarray(model.cp_mass, f32)                  # [P]
    cp_mass_local = jnp.asarray(model.cp_mass_local, f32)      # [P]

    Wb = body_rot[:, cp_body]                                  # [N, P, 3, 3]
    ob = body_pos[:, cp_body]                                  # [N, P, 3]
    r_w = jnp.einsum("npij,pj->npi", Wb, cp_pos)               # lever arm world
    x_w = ob + r_w                                             # point world pos

    # point velocity: v = v_body_origin + omega_body x r
    omega_w, v_origin_w = _body_world_velocities(model, state, body_rot)
    v_pt = v_origin_w[:, cp_body] + jnp.cross(omega_w[:, cp_body], r_w)

    phi = x_w[..., 2] - cp_radius                              # penetration (<0)
    pen = jnp.maximum(-phi, 0.0)
    active = phi < 0.0

    omega_n = 2.0 / params.contact_timeconst
    # Spring/damping rates capped by the explicit-integration stability
    # limit.  Explicit points (the G1 foot-pad spheres) are the designed
    # load-bearing contacts: they keep the full load-scaled stiffness so
    # standing penetration stays at the mm level.  Auto-generated points
    # (mesh AABB corners, cylinder ends) exist for termination detection and
    # crash plausibility; they get a rotation-aware stability cap (cp_mass_
    # stab includes the r^2/I lever term) so deep slams on light, thin links
    # cannot ratchet energy under explicit integration.
    cp_mass_stab = jnp.asarray(model.cp_mass_stab, f32)
    explicit = jnp.asarray(model.cp_explicit)
    k_cap = jnp.where(explicit, jnp.inf, 0.25 * cp_mass_stab / (dt * dt))
    b_cap = jnp.where(explicit, cp_mass_local / dt, 0.5 * cp_mass_stab / dt)
    k = jnp.minimum(cp_mass * omega_n * omega_n, k_cap)
    b = jnp.minimum(2.0 * params.contact_dampratio * cp_mass * omega_n, b_cap)
    fn = jnp.maximum(k * pen - b * v_pt[..., 2], 0.0) * active

    v_t = v_pt[..., 0:2]
    speed = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1) + 1e-10)
    # stick clamp: friction can stop the slip within one substep but never
    # reverse it — rotation-aware mass for auto points (friction torque at a
    # corner lever arm would otherwise spin light links unstably)
    stick_mass = jnp.where(explicit, cp_mass_local, cp_mass_stab)
    f_stick = stick_mass * speed / dt
    mu = jnp.asarray(params.friction_mu)
    mu = mu[:, None] if mu.ndim == 1 else mu       # [N] per-env DR -> [N, 1]
    f_t_mag = jnp.minimum(mu * fn, f_stick)
    f_t = -(f_t_mag / speed)[..., None] * v_t

    f_w = jnp.concatenate([f_t, fn[..., None]], axis=-1)       # [N, P, 3]
    tau_w = jnp.cross(r_w, f_w)
    f_sp = jnp.concatenate([tau_w, f_w], axis=-1)              # [N, P, 6]

    # accumulate per body
    f_ext = jnp.zeros((body_pos.shape[0], model.nb, 6), f32)
    f_ext = f_ext.at[:, cp_body].add(f_sp)

    contact = jnp.zeros((body_pos.shape[0], model.nb), f32)
    contact = contact.at[:, cp_body].add(fn)
    return f_ext, contact


def self_collision_forces(
    model: PhysicsModel, params: EngineParams, body_pos, body_rot,
    omega_w, v_origin_w, dt,
):
    """Sphere-sphere self-collision penalty forces.

    Returns f_ext_sc [N, nb, 6] world spatial forces about body origins.
    Spheres/pairs come from the model build (model.py:_build_self_collision,
    rest-pose-pruned); the spring/damper rates follow the ground-contact
    stability caps.  Self-contacts do NOT feed the ground-contact
    termination map (the reference queries contacts with the plane entity
    only, robot.py:221-231).
    """
    f32 = body_pos.dtype
    N = body_pos.shape[0]
    f_ext = jnp.zeros((N, model.nb, 6), f32)
    if model.sc_pairs.size == 0 or not params.self_collision:
        return f_ext

    scb = model.sc_body
    Wb = body_rot[:, scb]                                    # [N, S, 3, 3]
    r_w = jnp.einsum("nsij,sj->nsi", Wb, jnp.asarray(model.sc_pos, f32))
    x_w = body_pos[:, scb] + r_w                             # [N, S, 3]
    v_pt = v_origin_w[:, scb] + jnp.cross(omega_w[:, scb], r_w)

    ia, ib = model.sc_pairs[:, 0], model.sc_pairs[:, 1]
    d = x_w[:, ia] - x_w[:, ib]                              # [N, Q, 3]
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    rsum = jnp.asarray(model.sc_radius[ia] + model.sc_radius[ib], f32)
    pen = rsum - dist
    active = (pen > 0.0).astype(f32)
    n = d / dist[..., None]

    omega_n = 2.0 / params.contact_timeconst
    m = np.asarray(model.sc_stiff_mass, np.float64)
    k = np.minimum(m * omega_n * omega_n, 0.25 * m / (dt * dt)).astype(np.float32)
    b = np.minimum(2.0 * m * omega_n, 0.5 * m / dt).astype(np.float32)

    vn = jnp.sum((v_pt[:, ia] - v_pt[:, ib]) * n, axis=-1)
    fmag = jnp.maximum(k * pen - b * vn, 0.0) * active       # [N, Q]
    f = fmag[..., None] * n                                  # on sphere a

    tau_a = jnp.cross(r_w[:, ia], f)
    tau_b = jnp.cross(r_w[:, ib], -f)
    f_ext = f_ext.at[:, scb[ia], 0:3].add(tau_a)
    f_ext = f_ext.at[:, scb[ia], 3:6].add(f)
    f_ext = f_ext.at[:, scb[ib], 0:3].add(tau_b)
    f_ext = f_ext.at[:, scb[ib], 3:6].add(-f)
    return f_ext


GROUND = -1  # link_b value for robot-vs-ground pairs


def contact_pairs(model: PhysicsModel, params: EngineParams, state: SimState):
    """Generic "who touched whom" query with static shapes.

    TPU-native equivalent of the reference's contact surface
    (base_engine.py:300-319: fixed-size ``{link_a, link_b, valid_mask}``
    decoded from the warp arrays on CPU): the pair table is static — every
    collidable body vs the ground plane, plus every curated self-collision
    body pair — and validity/forces are per-env device arrays, so the query
    jits and never leaves the device (SURVEY.md §3.3 flags the reference's
    CPU decode as its biggest single-device bottleneck).

    Returns a dict:
      link_a   [Q] int32 (numpy, static) — body index
      link_b   [Q] int32 (numpy, static) — body index or GROUND (-1)
      force    [N, Q] float — contact normal-force magnitude
      valid    [N, Q] bool  — force > 0
    """
    f32 = state.root_pos.dtype
    body_pos, body_rot = forward_kinematics(model, state)
    dt = params.ctrl_dt / params.substeps

    # ground pairs: bodies owning contact points, in body order
    ground_bodies = np.unique(np.asarray(model.cp_body))
    _, per_body = contact_forces(model, params, body_pos, body_rot, state, dt)
    ground_force = per_body[:, ground_bodies]                  # [N, G]

    link_a = [ground_bodies.astype(np.int32)]
    link_b = [np.full(len(ground_bodies), GROUND, np.int32)]
    forces = [ground_force]

    if model.sc_pairs.size and params.self_collision:
        scb = model.sc_body
        ia, ib = model.sc_pairs[:, 0], model.sc_pairs[:, 1]
        # sphere pairs -> unique body-level pairs (static mapping)
        bp = np.stack([scb[ia], scb[ib]], axis=1)
        bp_sorted = np.sort(bp, axis=1)
        uniq, inv = np.unique(bp_sorted, axis=0, return_inverse=True)

        omega_w, v_origin_w = _body_world_velocities(model, state, body_rot)
        Wb = body_rot[:, scb]
        r_w = jnp.einsum("nsij,sj->nsi", Wb, jnp.asarray(model.sc_pos, f32))
        x_w = body_pos[:, scb] + r_w
        v_pt = v_origin_w[:, scb] + jnp.cross(omega_w[:, scb], r_w)
        d = x_w[:, ia] - x_w[:, ib]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        rsum = jnp.asarray(model.sc_radius[ia] + model.sc_radius[ib], f32)
        pen = rsum - dist
        active = (pen > 0.0).astype(f32)
        omega_n = 2.0 / params.contact_timeconst
        m = np.asarray(model.sc_stiff_mass, np.float64)
        k = np.minimum(
            m * omega_n * omega_n, 0.25 * m / (dt * dt)
        ).astype(np.float32)
        b = np.minimum(2.0 * m * omega_n, 0.5 * m / dt).astype(np.float32)
        n = d / dist[..., None]
        vn = jnp.sum((v_pt[:, ia] - v_pt[:, ib]) * n, axis=-1)
        fmag = jnp.maximum(k * pen - b * vn, 0.0) * active     # [N, S]
        # aggregate sphere-pair forces onto their body pair
        N_env = fmag.shape[0]
        agg = jnp.zeros((N_env, len(uniq)), f32).at[:, inv].add(fmag)
        link_a.append(uniq[:, 0].astype(np.int32))
        link_b.append(uniq[:, 1].astype(np.int32))
        forces.append(agg)

    force = jnp.concatenate(forces, axis=1)
    # report the forces the dynamics actually applied: under mass DR the
    # substep scales contact forces by mass_scale (mass-proportional
    # springs keep penetration depth mass-invariant)
    ms = mass_scale_or_none(params, f32)
    if ms is not None:
        force = force * ms[:, None]
    return dict(
        link_a=np.concatenate(link_a),
        link_b=np.concatenate(link_b),
        force=force,
        valid=force > 0.0,
    )


def _body_world_velocities(model: PhysicsModel, state: SimState, body_rot):
    """Angular velocity and origin linear velocity of every body (world).

    Outward recursion mirroring FK: omega_i = omega_p + W_i a_i qd_i,
    v_i = v_p + omega_p x (o_i - o_p).
    """
    f32 = state.root_pos.dtype
    axes = jnp.asarray(model.joint_axis, f32)
    local_pos = jnp.asarray(model.local_pos, f32)

    omega = [state.root_ang_vel]
    vel = [state.root_vel]
    # positions needed for lever arms: recompute origins relative to parent
    W = body_rot
    for i in range(1, model.nb):
        p = int(model.parent[i])
        r = jnp.einsum("nij,j->ni", W[:, p], local_pos[i])     # o_i - o_p world
        omega_i = omega[p] + jnp.einsum(
            "nij,j->ni", W[:, i], axes[i]
        ) * state.dof_vel[:, i - 1 : i]
        vel_i = vel[p] + jnp.cross(omega[p], r)
        omega.append(omega_i)
        vel.append(vel_i)
    return jnp.stack(omega, axis=1), jnp.stack(vel, axis=1)


# ----------------------------------------------------------------------- step


def apply_pd_target(model: PhysicsModel, params: EngineParams, state: SimState, target):
    """Clamp targets to joint limits (with margin) and slew-limit the change.

    Ref: mjwarp_engine.py:807-851.
    """
    lo = jnp.asarray(model.dof_limit[:, 0], target.dtype) + params.position_limit_margin
    hi = jnp.asarray(model.dof_limit[:, 1], target.dtype) - params.position_limit_margin
    tgt = jnp.clip(target, lo, hi)
    delta = jnp.clip(
        tgt - state.pd_target, -params.max_target_delta, params.max_target_delta
    )
    return state.pd_target + delta


def mass_scale_or_none(params: EngineParams, dtype=jnp.float32):
    """Per-env mass scale [N] as data, or None when the (default) python
    scalar 1.0 keeps the non-DR compile zero-cost."""
    msv = params.mass_scale
    if isinstance(msv, (int, float)):
        if float(msv) == 1.0:
            return None
        msv = jnp.asarray(msv, dtype)
    msv = jnp.asarray(msv, dtype)
    # 0-d (e.g. a traced scalar when params are jit arguments) -> [1]
    return msv[None] if msv.ndim == 0 else msv


def narrowphase_f_ext(model: PhysicsModel, params: EngineParams,
                      body_pos, body_rot, omega_w, v_origin_w, dt):
    """Optional narrowphase contact wrenches: capsule pairs + general
    geom-geom pairs (physics/narrowphase.py).  Returns [N, nb, 6] or None
    when the model opted into neither."""
    out = None
    if model.capsules is not None and model.capsules.num_pairs:
        from add_gym_tpu.physics.narrowphase import capsule_f_ext

        out = capsule_f_ext(
            model.capsules, body_pos, body_rot, omega_w, v_origin_w, dt,
            params.contact_timeconst, model.nb,
        )
    if model.geoms is not None and model.geoms.num_pairs:
        from add_gym_tpu.physics.narrowphase import geom_f_ext

        g = geom_f_ext(
            model.geoms, body_pos, body_rot, omega_w, v_origin_w, dt,
            params.contact_timeconst, model.nb,
        )
        out = g if out is None else out + g
    return out


def substep(model: PhysicsModel, params: EngineParams, state: SimState, dt: float,
            held_f_ext=None):
    """One physics substep: contacts -> PD torque -> ABA -> integrate.

    ``held_f_ext`` carries the slow contact forces precomputed once per
    control step (self-collision + capsule/geom narrowphase, see
    :func:`step`); when None they are all evaluated live here.
    """
    body_pos, body_rot = forward_kinematics(model, state)
    f_ext_w, contact = contact_forces(model, params, body_pos, body_rot, state, dt)
    if held_f_ext is not None:
        f_ext_w = f_ext_w + held_f_ext
    else:
        need_sc = params.self_collision and model.sc_pairs.size
        need_np = (
            (model.capsules is not None and model.capsules.num_pairs)
            or (model.geoms is not None and model.geoms.num_pairs)
        )
        if need_sc or need_np:
            omega_w, v_origin_w = _body_world_velocities(
                model, state, body_rot
            )
            if need_sc:
                f_ext_w = f_ext_w + self_collision_forces(
                    model, params, body_pos, body_rot, omega_w, v_origin_w, dt
                )
            np_ext = narrowphase_f_ext(
                model, params, body_pos, body_rot, omega_w, v_origin_w, dt
            ) if need_np else None
            if np_ext is not None:
                f_ext_w = f_ext_w + np_ext
    ms = mass_scale_or_none(params, state.root_pos.dtype)
    if ms is not None:
        # contact/self-collision springs are mass-proportional: penetration
        # depth stays mass-invariant (fused_step._substep_core semantics)
        f_ext_w = f_ext_w * ms[:, None, None]
        contact = contact * ms[:, None]

    # PD torque (explicit part), ref mjwarp_engine.py:1554-1607
    q, qd = state.dof_pos, state.dof_vel
    tau_pd = params.kp * (state.pd_target - q) - params.kv * qd
    tau_pd = jnp.clip(tau_pd, -params.max_torque, params.max_torque)

    damping = jnp.asarray(model.dof_damping, q.dtype)
    friction = jnp.asarray(model.dof_friction, q.dtype)
    tau = tau_pd - damping * qd - friction * jnp.tanh(qd / 0.05)

    # joint-limit penalty torque (springy stop + damping when violating)
    lo = jnp.asarray(model.dof_limit[:, 0], q.dtype)
    hi = jnp.asarray(model.dof_limit[:, 1], q.dtype)
    k_lim = 400.0
    viol_lo = jnp.maximum(lo - q, 0.0)
    viol_hi = jnp.maximum(q - hi, 0.0)
    tau = tau + k_lim * viol_lo - k_lim * viol_hi

    # root spatial velocity in root body coords
    W0 = body_rot[:, 0]
    w_b = jnp.einsum("nji,nj->ni", W0, state.root_ang_vel)
    v_b = jnp.einsum("nji,nj->ni", W0, state.root_vel)
    root_vel_b = jnp.concatenate([w_b, v_b], axis=-1)

    joint_rot = joint_rot_mats(model, state.dof_pos)
    implicit_d = damping + params.kv
    qdd, root_acc = aba(
        model,
        body_rot,
        root_vel_b,
        qd,
        joint_rot,
        tau,
        f_ext_w,
        implicit_d,
        dt,
        gravity=params.gravity,
        ms=ms,
    )

    # --- semi-implicit Euler
    # root: convert body-frame spatial acc to world classical acc
    wdot_w = jnp.einsum("nij,nj->ni", W0, root_acc[:, 0:3])
    a_lin_w = jnp.einsum("nij,nj->ni", W0, root_acc[:, 3:6]) + jnp.cross(
        state.root_ang_vel, state.root_vel
    )
    root_ang_vel = state.root_ang_vel + dt * wdot_w
    root_vel = state.root_vel + dt * a_lin_w
    root_pos = state.root_pos + dt * root_vel
    dq = rot.exp_map_to_quat(dt * root_ang_vel)
    root_quat = rot.quat_normalize(rot.quat_mul(dq, state.root_quat))

    dof_vel = qd + dt * qdd
    dof_pos = q + dt * dof_vel

    # hard joint-limit projection backstop: clamp + kill outward velocity
    over_hi = dof_pos > hi
    under_lo = dof_pos < lo
    dof_vel = jnp.where(over_hi & (dof_vel > 0), 0.0, dof_vel)
    dof_vel = jnp.where(under_lo & (dof_vel < 0), 0.0, dof_vel)
    dof_pos = jnp.clip(dof_pos, lo, hi)

    # global velocity guards: keep post-failure states finite (episodes
    # terminate on those contacts; see add_done semantics) without NaNs
    # poisoning the batch
    vmax = 100.0
    dof_vel = jnp.clip(dof_vel, -vmax, vmax)
    root_vel = jnp.clip(root_vel, -vmax, vmax)
    root_ang_vel = jnp.clip(root_ang_vel, -vmax, vmax)

    new_state = SimState(
        root_pos=root_pos,
        root_quat=root_quat,
        root_vel=root_vel,
        root_ang_vel=root_ang_vel,
        dof_pos=dof_pos,
        dof_vel=dof_vel,
        pd_target=state.pd_target,
    )
    return new_state, contact


def step(model: PhysicsModel, params: EngineParams, state: SimState, pd_target):
    """One control step = clamp/slew PD target + ``substeps`` physics substeps.

    Returns (new_state, body_contact [N, nb] — normal force accumulated on
    each body over the last substep, used for contact termination).
    """
    tgt = apply_pd_target(model, params, state, pd_target)
    state = SimState(
        root_pos=state.root_pos,
        root_quat=state.root_quat,
        root_vel=state.root_vel,
        root_ang_vel=state.root_ang_vel,
        dof_pos=state.dof_pos,
        dof_vel=state.dof_vel,
        pd_target=tgt,
    )
    dt = params.ctrl_dt / params.substeps

    # self-collision + narrowphase forces vary slowly vs the 400 Hz substep
    # rate: evaluate once per control step and hold (matches fused_step /
    # pallas_step)
    held_f_ext = None
    need_sc = params.self_collision and model.sc_pairs.size
    need_np = (
        (model.capsules is not None and model.capsules.num_pairs)
        or (model.geoms is not None and model.geoms.num_pairs)
    )
    if need_sc or need_np:
        body_pos, body_rot = forward_kinematics(model, state)
        omega_w, v_origin_w = _body_world_velocities(model, state, body_rot)
        if need_sc:
            held_f_ext = self_collision_forces(
                model, params, body_pos, body_rot, omega_w, v_origin_w, dt
            )
        if need_np:
            np_ext = narrowphase_f_ext(
                model, params, body_pos, body_rot, omega_w, v_origin_w, dt
            )
            held_f_ext = (
                np_ext if held_f_ext is None else held_f_ext + np_ext
            )

    def body(s, _):
        s, contact = substep(model, params, s, dt, held_f_ext)
        return s, contact

    state, contacts = jax.lax.scan(body, state, None, length=params.substeps)
    return state, contacts[-1]
