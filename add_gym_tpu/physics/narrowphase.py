"""Capsule-capsule narrowphase collision (optional contact module).

Widens the contact surface beyond the plane + curated sphere pairs: the
reference engines inherit general geom-geom narrowphase from MuJoCo /
Genesis (`mjwarp_engine.py:896-986` decodes arbitrary contacts); here the
TPU-native equivalent is a static-shape capsule pair table evaluated as a
batched segment-segment distance query — no broadphase, no dynamic
contact counts, everything jits and shards along the env axis.

Capsules are body-frame segments + radii; forces use the same
mass-proportional spring-damper as the engine's sphere-sphere
self-collision (engine.self_collision_forces), so penetration depth stays
mass-invariant and the stiffness respects the dt stability clamp.

Supported on the reference-layout engine path (`engine.step`); the fused /
Pallas hot paths intentionally exclude it (G1 imitation has no capsule
pairs; enabling capsules is a per-task opt-in via
``parse_capsules`` + ``PhysicsModel.capsules``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass(frozen=True)
class CapsuleSet:
    """Static capsule geometry + candidate pair table (host constants)."""

    body: np.ndarray        # [C] body index
    p0: np.ndarray          # [C, 3] segment start, body frame
    p1: np.ndarray          # [C, 3] segment end, body frame
    radius: np.ndarray      # [C]
    pairs: np.ndarray       # [P, 2] capsule indices
    stiff_mass: np.ndarray  # [P] effective mass for the contact spring

    @property
    def num_pairs(self) -> int:
        return int(self.pairs.shape[0]) if self.pairs.size else 0


EMPTY_CAPSULES = CapsuleSet(
    body=np.zeros((0,), np.int32),
    p0=np.zeros((0, 3), np.float32),
    p1=np.zeros((0, 3), np.float32),
    radius=np.zeros((0,), np.float32),
    pairs=np.zeros((0, 2), np.int32),
    stiff_mass=np.zeros((0,), np.float32),
)


def segment_closest_points(a0, a1, b0, b1, eps: float = 1e-9):
    """Closest points between segments [a0,a1] and [b0,b1].

    Batched over arbitrary leading dims; returns (pa, pb) points.  Clamped
    quadratic minimization (Ericson, Real-Time Collision Detection §5.1.9)
    with eps guards so degenerate (zero-length) segments reduce to points —
    branch-free, TPU-friendly.
    """
    d1 = a1 - a0
    d2 = b1 - b0
    r = a0 - b0
    a = jnp.sum(d1 * d1, axis=-1)
    e = jnp.sum(d2 * d2, axis=-1)
    f = jnp.sum(d2 * r, axis=-1)
    c = jnp.sum(d1 * r, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    denom = a * e - b * b

    # first candidate for s (parallel / degenerate -> 0), then alternate
    # projections with clamping (two passes reach the true optimum for
    # all clamp configurations)
    s = jnp.where(denom > eps, (b * f - c * e) / jnp.maximum(denom, eps), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = jnp.where(e > eps, (b * s + f) / jnp.maximum(e, eps), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    s = jnp.where(a > eps, (b * t - c) / jnp.maximum(a, eps), 0.0)
    s = jnp.clip(s, 0.0, 1.0)

    pa = a0 + s[..., None] * d1
    pb = b0 + t[..., None] * d2
    return pa, pb


def capsule_pair_forces(
    caps: CapsuleSet, body_pos, body_rot, omega_w, v_origin_w, dt: float,
    contact_timeconst: float,
):
    """Spring-damper contact forces for every capsule pair.

    Args mirror engine.self_collision_forces: body_pos/body_rot [N, nb, ...]
    world-frame FK, omega_w/v_origin_w [N, nb, 3] world body velocities.

    Returns (force_on_a [N, P, 3], point_a [N, P, 3], point_b [N, P, 3],
    fmag [N, P]): equal-and-opposite forces applied at the closest points.
    """
    f32 = body_pos.dtype
    cb = caps.body
    Wb = body_rot[:, cb]                                     # [N, C, 3, 3]
    e0 = body_pos[:, cb] + jnp.einsum(
        "ncij,cj->nci", Wb, jnp.asarray(caps.p0, f32)
    )
    e1 = body_pos[:, cb] + jnp.einsum(
        "ncij,cj->nci", Wb, jnp.asarray(caps.p1, f32)
    )

    ia, ib = caps.pairs[:, 0], caps.pairs[:, 1]
    pa, pb = segment_closest_points(
        e0[:, ia], e1[:, ia], e0[:, ib], e1[:, ib]
    )
    d = pa - pb
    dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
    rsum = jnp.asarray(caps.radius[ia] + caps.radius[ib], f32)
    pen = rsum - dist
    active = (pen > 0.0).astype(f32)
    n = d / dist[..., None]

    # same critical-damping spring with dt-stability clamp as the
    # sphere-sphere module (engine.self_collision_forces)
    omega_n = 2.0 / contact_timeconst
    m = np.asarray(caps.stiff_mass, np.float64)
    k = np.minimum(m * omega_n * omega_n, 0.25 * m / (dt * dt)).astype(np.float32)
    bd = np.minimum(2.0 * m * omega_n, 0.5 * m / dt).astype(np.float32)

    ba, bb = cb[ia], cb[ib]
    ra = pa - body_pos[:, ba]
    rb = pb - body_pos[:, bb]
    va = v_origin_w[:, ba] + jnp.cross(omega_w[:, ba], ra)
    vb = v_origin_w[:, bb] + jnp.cross(omega_w[:, bb], rb)
    vn = jnp.sum((va - vb) * n, axis=-1)

    fmag = jnp.maximum(k * pen - bd * vn, 0.0) * active      # [N, P]
    f = fmag[..., None] * n
    return f, pa, pb, fmag


def capsule_f_ext(caps: CapsuleSet, body_pos, body_rot, omega_w, v_origin_w,
                  dt: float, contact_timeconst: float, nb: int):
    """Accumulate capsule-pair contact wrenches into an [N, nb, 6] f_ext
    delta ([torque, force] about each body origin, world frame)."""
    f, pa, pb, _ = capsule_pair_forces(
        caps, body_pos, body_rot, omega_w, v_origin_w, dt, contact_timeconst
    )
    ia, ib = caps.pairs[:, 0], caps.pairs[:, 1]
    ba, bb = caps.body[ia], caps.body[ib]
    N = body_pos.shape[0]
    f_ext = jnp.zeros((N, nb, 6), body_pos.dtype)
    tau_a = jnp.cross(pa - body_pos[:, ba], f)
    tau_b = jnp.cross(pb - body_pos[:, bb], -f)
    f_ext = f_ext.at[:, ba, 0:3].add(tau_a)
    f_ext = f_ext.at[:, ba, 3:6].add(f)
    f_ext = f_ext.at[:, bb, 0:3].add(tau_b)
    f_ext = f_ext.at[:, bb, 3:6].add(-f)
    return f_ext


def parse_capsules(mjcf_path: str, body_names, masses,
                   exclude_adjacent: bool = True) -> CapsuleSet:
    """Collect capsule/cylinder collision geoms from an MJCF file and build
    an all-pairs candidate table (different bodies; optionally skipping
    parent-child pairs, which are articulation-constrained).

    ``body_names`` fixes the body index order (the PhysicsModel BFS order);
    ``masses`` [nb] feed the per-pair contact stiffness (min of the pair).
    """
    import xml.etree.ElementTree as ET

    from add_gym_tpu.physics.model import _parse_vec, _quat_wxyz_to_mat

    tree = ET.parse(mjcf_path)
    name_to_idx = {n: i for i, n in enumerate(body_names)}

    body, p0, p1, radius = [], [], [], []
    parent_of = {}

    def walk(el, parent_name):
        for child in el:
            if child.tag != "body":
                continue
            name = child.attrib.get("name", "")
            parent_of[name] = parent_name
            bi = name_to_idx.get(name)
            if bi is not None:
                for g in child.findall("geom"):
                    gtype = g.attrib.get("type", "sphere")
                    if gtype not in ("capsule", "cylinder"):
                        continue
                    size = _parse_vec(g, "size", [0.01, 0.01])
                    r, hl = float(size[0]), float(size[1])
                    pos = np.asarray(_parse_vec(g, "pos", [0, 0, 0]), np.float64)
                    R = _quat_wxyz_to_mat(_parse_vec(g, "quat", [1, 0, 0, 0]))
                    axis = R @ np.array([0.0, 0.0, 1.0])
                    body.append(bi)
                    p0.append(pos - hl * axis)
                    p1.append(pos + hl * axis)
                    radius.append(r)
            walk(child, name)

    worldbody = tree.getroot().find("worldbody")
    if worldbody is not None:
        walk(worldbody, None)

    body_np = np.asarray(body, np.int32)
    pairs = []
    idx_to_name = {i: n for n, i in name_to_idx.items()}
    for i in range(len(body)):
        for j in range(i + 1, len(body)):
            bi, bj = body_np[i], body_np[j]
            if bi == bj:
                continue
            if exclude_adjacent:
                ni, nj = idx_to_name[int(bi)], idx_to_name[int(bj)]
                if parent_of.get(ni) == nj or parent_of.get(nj) == ni:
                    continue
            pairs.append((i, j))
    pairs_np = (
        np.asarray(pairs, np.int32) if pairs else np.zeros((0, 2), np.int32)
    )
    masses = np.asarray(masses, np.float64)
    stiff = (
        np.minimum(masses[body_np[pairs_np[:, 0]]],
                   masses[body_np[pairs_np[:, 1]]]).astype(np.float32)
        if pairs_np.size else np.zeros((0,), np.float32)
    )
    return CapsuleSet(
        body=body_np,
        p0=np.asarray(p0, np.float32) if p0 else np.zeros((0, 3), np.float32),
        p1=np.asarray(p1, np.float32) if p1 else np.zeros((0, 3), np.float32),
        radius=np.asarray(radius, np.float32) if radius else np.zeros((0,), np.float32),
        pairs=pairs_np,
        stiff_mass=stiff,
    )
