"""Geom-geom narrowphase collision (optional contact module).

Widens the contact surface beyond the plane + curated sphere pairs: the
reference engines inherit general geom-geom narrowphase from MuJoCo /
Genesis (`mjwarp_engine.py:896-986` decodes arbitrary contacts); here the
TPU-native equivalent is static-shape pair tables evaluated as batched
closest-point queries — no broadphase, no dynamic contact counts,
everything jits and shards along the env axis.  Two tiers:

- :class:`CapsuleSet` / :func:`capsule_f_ext` — capsule/cylinder pairs
  only (round-2 module, kept for API stability).
- :class:`GeomSet` / :func:`geom_f_ext` — the general module: spheres,
  capsules and cylinders unify into segments (a sphere is a zero-length
  capsule), plus oriented boxes with exact point-box, fixed-iteration
  segment-box and vertex-manifold box-box queries.

Capsules are body-frame segments + radii; forces use the same
mass-proportional spring-damper as the engine's sphere-sphere
self-collision (engine.self_collision_forces), so penetration depth stays
mass-invariant and the stiffness respects the dt stability clamp.

Backend coverage (round 4): the general :class:`GeomSet` tier runs on
every backend — the reference-layout engine path evaluates it inline
per substep, the fused XLA path computes held per-control-step wrenches
(``fused_step.compute_np_ext``), and the Pallas megakernel takes the same
held wrenches as an extra ``[6*n_touched, N]`` input (``pallas_step``
``np_rows``; ``builder.py`` keeps the kernel selected when
``general_narrowphase`` is on).  Only the legacy :class:`CapsuleSet` tier
(``capsule_f_ext``) remains engine-path-only — it predates GeomSet and is
kept for API stability; enabling it is a per-task opt-in via
``parse_capsules`` + ``PhysicsModel.capsules``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
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


# --------------------------------------------------------------------------
# General geom-geom narrowphase: spheres/capsules/cylinders unify into
# segments (a sphere is a zero-length capsule), boxes get their own closest-
# point queries.  Three static pair tables (seg-seg, seg-box, box-box) keep
# everything fixed-shape and branch-free for XLA; the reference engines get
# the same generality from MuJoCo/Genesis narrowphase (mjwarp_engine.py:
# 896-986) with dynamic contact buffers — here contact *candidates* are
# static and activation is a mask, the TPU-native formulation.
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class GeomSet:
    """Static collision geometry + candidate pair tables (host constants).

    Segments cover sphere (p0 == p1), capsule and cylinder geoms; boxes are
    oriented half-extent boxes.  Pair tables index into these arrays:
    ``ss_pairs`` [P,2] (segment, segment), ``sb_pairs`` [Q,2] (segment,
    box), ``bb_pairs`` [R,2] (box, box).
    """

    seg_body: np.ndarray    # [S] body index
    seg_p0: np.ndarray      # [S, 3] body frame
    seg_p1: np.ndarray      # [S, 3]
    seg_radius: np.ndarray  # [S]
    box_body: np.ndarray    # [B] body index
    box_pos: np.ndarray     # [B, 3] center, body frame
    box_rot: np.ndarray     # [B, 3, 3] box->body rotation
    box_half: np.ndarray    # [B, 3] half extents
    ss_pairs: np.ndarray    # [P, 2]
    ss_mass: np.ndarray     # [P]
    sb_pairs: np.ndarray    # [Q, 2]
    sb_mass: np.ndarray     # [Q]
    bb_pairs: np.ndarray    # [R, 2]
    bb_mass: np.ndarray     # [R]

    @property
    def num_pairs(self) -> int:
        return int(
            self.ss_pairs.shape[0] + self.sb_pairs.shape[0]
            + self.bb_pairs.shape[0]
        )


def box_surface_point(l, h, eps: float = 1e-9):
    """Closest surface point of an axis-aligned box to local point(s) ``l``.

    ``l`` [..., 3] local coordinates, ``h`` [..., 3] half extents.  Returns
    (q, n, sd): surface point, outward normal and *signed* distance —
    positive outside, negative inside (push-out to the nearest face).
    Branch-free (jnp.where), batched over leading dims.
    """
    lc = jnp.clip(l, -h, h)
    delta = l - lc
    out_d = jnp.sqrt(jnp.sum(delta * delta, axis=-1) + eps)
    outside = jnp.any(jnp.abs(l) > h, axis=-1)

    # interior: push out through the nearest face
    face_d = h - jnp.abs(l)                             # [..., 3] >= 0 inside
    k = jnp.argmin(face_d, axis=-1)
    onehot = jax.nn.one_hot(k, 3, dtype=l.dtype)
    sgn = jnp.where(jnp.take_along_axis(l, k[..., None], -1)[..., 0] >= 0, 1.0, -1.0)
    n_in = sgn[..., None] * onehot
    q_in = l * (1.0 - onehot) + n_in * h
    d_in = -jnp.min(face_d, axis=-1)

    n_out = delta / out_d[..., None]
    q = jnp.where(outside[..., None], lc, q_in)
    n = jnp.where(outside[..., None], n_out, n_in)
    sd = jnp.where(outside, out_d, d_in)
    return q, n, sd


def segment_box_closest(a, b, h, iters: int = 4):
    """Closest point between segment [a, b] and an axis-aligned box, in the
    box's local frame.  Multi-start alternating projection: 5 fixed samples
    along the segment seed the best t, then a few segment->box->segment
    projection rounds refine it (both sets are convex, so the iteration
    converges; the multi-start bounds the nearly-parallel slow cases) —
    data-independent trip counts, XLA-friendly.  Returns (p, q, n, sd):
    segment point, box surface point, outward box normal at q, signed
    distance of p to the box.
    """
    d = b - a

    # dist^2(seg(t), box) is convex in t (distance to a convex set along a
    # line), so a fixed-count ternary search is provably convergent: 24
    # rounds shrink [0,1] by (2/3)^24 ~ 6e-5.
    def f(t):
        p = a + t[..., None] * d
        cl = jnp.clip(p, -h, h)
        return jnp.sum(jnp.square(p - cl), axis=-1)

    lo = jnp.zeros(a.shape[:-1], a.dtype)
    hi = jnp.ones(a.shape[:-1], a.dtype)
    for _ in range(24):
        m1 = lo + (hi - lo) / 3.0
        m2 = hi - (hi - lo) / 3.0
        left = f(m1) < f(m2)
        lo = jnp.where(left, lo, m1)
        hi = jnp.where(left, m2, hi)
    t = 0.5 * (lo + hi)

    # penetration case: f == 0 on an interval; refine toward the deepest
    # point with a few alternating projections on the *surface* query
    dd = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-12)
    for _ in range(iters):
        p = a + t[..., None] * d
        q, _, sd = box_surface_point(p, h)
        t_new = jnp.clip(jnp.sum((q - a) * d, axis=-1) / dd, 0.0, 1.0)
        t = jnp.where(sd < 0, t, t_new)
    p = a + t[..., None] * d
    q, n, sd = box_surface_point(p, h)
    return p, q, n, sd


def _pair_spring(mass, pen, vn, dt: float, contact_timeconst: float):
    """The engine's critically-damped contact spring with the dt-stability
    clamp (engine.self_collision_forces family): force magnitude [N, P]."""
    omega_n = 2.0 / contact_timeconst
    m = np.asarray(mass, np.float64)
    k = np.minimum(m * omega_n * omega_n, 0.25 * m / (dt * dt)).astype(np.float32)
    bd = np.minimum(2.0 * m * omega_n, 0.5 * m / dt).astype(np.float32)
    active = (pen > 0.0).astype(pen.dtype)
    return jnp.maximum(k * pen - bd * vn, 0.0) * active


def _point_velocity(body_pos, omega_w, v_origin_w, b, p):
    """World velocity of point ``p`` [N, P, 3] on bodies ``b`` [P]."""
    return v_origin_w[:, b] + jnp.cross(omega_w[:, b], p - body_pos[:, b])


def geom_f_ext(gs: GeomSet, body_pos, body_rot, omega_w, v_origin_w,
               dt: float, contact_timeconst: float, nb: int):
    """Accumulate all geom-geom narrowphase contact wrenches into an
    [N, nb, 6] f_ext delta ([torque, force] about body origins, world).

    seg-seg contacts are exact; seg-box uses the fixed-iteration
    alternating projection; box-box applies a vertex-contact model (each
    penetrating vertex of A in B and of B in A contributes a push-out
    spring — face-face rests get the stable 4-vertex manifold; deep
    symmetric overlap may double-count, acceptable for a penalty model).
    """
    f32 = body_pos.dtype
    N = body_pos.shape[0]
    f_ext = jnp.zeros((N, nb, 6), f32)

    def apply(f_ext, ba, bb_, pa, pb, n, pen, mass):
        """Spring force along n on body ba at pa, reaction on bb_ at pb."""
        va = _point_velocity(body_pos, omega_w, v_origin_w, ba, pa)
        vb = _point_velocity(body_pos, omega_w, v_origin_w, bb_, pb)
        vn = jnp.sum((va - vb) * n, axis=-1)
        fmag = _pair_spring(mass, pen, vn, dt, contact_timeconst)
        f = fmag[..., None] * n
        tau_a = jnp.cross(pa - body_pos[:, ba], f)
        tau_b = jnp.cross(pb - body_pos[:, bb_], -f)
        f_ext = f_ext.at[:, ba, 0:3].add(tau_a)
        f_ext = f_ext.at[:, ba, 3:6].add(f)
        f_ext = f_ext.at[:, bb_, 0:3].add(tau_b)
        f_ext = f_ext.at[:, bb_, 3:6].add(-f)
        return f_ext

    # world-frame segment endpoints / box frames
    if gs.seg_body.size:
        sb = gs.seg_body
        Wb = body_rot[:, sb]
        e0 = body_pos[:, sb] + jnp.einsum("nsij,sj->nsi", Wb, jnp.asarray(gs.seg_p0, f32))
        e1 = body_pos[:, sb] + jnp.einsum("nsij,sj->nsi", Wb, jnp.asarray(gs.seg_p1, f32))
    if gs.box_body.size:
        bb = gs.box_body
        # box->world rotation and world center
        Rw = jnp.einsum("nbij,bjk->nbik", body_rot[:, bb], jnp.asarray(gs.box_rot, f32))
        cw = body_pos[:, bb] + jnp.einsum(
            "nbij,bj->nbi", body_rot[:, bb], jnp.asarray(gs.box_pos, f32)
        )

    if gs.ss_pairs.size:
        ia, ib = gs.ss_pairs[:, 0], gs.ss_pairs[:, 1]
        pa, pb = segment_closest_points(e0[:, ia], e1[:, ia], e0[:, ib], e1[:, ib])
        dvec = pa - pb
        dist = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1) + 1e-12)
        pen = jnp.asarray(gs.seg_radius[ia] + gs.seg_radius[ib], f32) - dist
        n = dvec / dist[..., None]
        f_ext = apply(f_ext, sb[ia], sb[ib], pa, pb, n, pen, gs.ss_mass)

    if gs.sb_pairs.size:
        si, bi = gs.sb_pairs[:, 0], gs.sb_pairs[:, 1]
        # segment endpoints into each box's local frame
        Rl, cl = Rw[:, bi], cw[:, bi]
        al = jnp.einsum("nqji,nqj->nqi", Rl, e0[:, si] - cl)
        bl = jnp.einsum("nqji,nqj->nqi", Rl, e1[:, si] - cl)
        hq = jnp.asarray(gs.box_half[bi], f32)
        p, q, nl, sd = segment_box_closest(al, bl, hq)
        pen = jnp.asarray(gs.seg_radius[si], f32) - sd
        pw = cl + jnp.einsum("nqij,nqj->nqi", Rl, p)
        qw = cl + jnp.einsum("nqij,nqj->nqi", Rl, q)
        nw = jnp.einsum("nqij,nqj->nqi", Rl, nl)
        f_ext = apply(
            f_ext, gs.seg_body[si], gs.box_body[bi], pw, qw, nw, pen, gs.sb_mass
        )

    if gs.bb_pairs.size:
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32,
        )                                                        # [8, 3]
        ia, ib = gs.bb_pairs[:, 0], gs.bb_pairs[:, 1]
        for (src, dst) in ((ia, ib), (ib, ia)):
            # 8 vertices of src box in world, then into dst box local frame
            vloc = corners[None, :, :] * np.asarray(gs.box_half)[src][:, None, :]
            vw = cw[:, src, None, :] + jnp.einsum(
                "nrij,rvj->nrvi", Rw[:, src], jnp.asarray(vloc, f32)
            )                                                    # [N, R, 8, 3]
            Rd, cd = Rw[:, dst], cw[:, dst]
            vl = jnp.einsum(
                "nrji,nrvj->nrvi", Rd, vw - cd[:, :, None, :]
            )
            hd = jnp.asarray(gs.box_half[dst], f32)[None, :, None, :]
            q, nl, sd = box_surface_point(vl, jnp.broadcast_to(hd, vl.shape))
            pen = -sd                                            # [N, R, 8]
            qw = cd[:, :, None, :] + jnp.einsum("nrij,nrvj->nrvi", Rd, q)
            nw = jnp.einsum("nrij,nrvj->nrvi", Rd, nl)
            ba = np.repeat(gs.box_body[src], 8)
            bb_ = np.repeat(gs.box_body[dst], 8)
            flat = lambda x: x.reshape((N, -1) + x.shape[3:])
            f_ext = apply(
                f_ext, ba, bb_, flat(vw), flat(qw), flat(nw), flat(pen),
                np.repeat(gs.bb_mass, 8),
            )
    return f_ext


def parse_geoms(mjcf_path: str, body_names, masses,
                exclude_adjacent: bool = True,
                mesh_as_box: bool = True) -> GeomSet:
    """Collect ALL primitive collision geoms (sphere/capsule/cylinder/box)
    from an MJCF into a :class:`GeomSet` with all-pairs candidate tables
    (different bodies; optionally skipping parent-child pairs, which are
    articulation-constrained).  The general-narrowphase analog of
    :func:`parse_capsules`.

    ``mesh_as_box`` approximates mesh geoms by their STL AABB as an
    oriented box (the same AABB the engine uses for contact-point
    generation) — on mesh-heavy models like the G1 this is most of the
    collision surface.

    Limitation: ``contype``/``conaffinity`` are read from geom attributes
    only; MJCF ``<default>`` class inheritance is not resolved (the G1
    sets them inline on every visual geom, as most robot MJCFs do).
    """
    import os
    import xml.etree.ElementTree as ET

    from add_gym_tpu.physics.model import _parse_vec, _quat_wxyz_to_mat

    tree = ET.parse(mjcf_path)
    name_to_idx = {n: i for i, n in enumerate(body_names)}
    compiler = tree.getroot().find("compiler")
    meshdir = os.path.join(
        os.path.dirname(os.path.abspath(mjcf_path)),
        compiler.attrib.get("meshdir", ".") if compiler is not None else ".",
    )

    seg_body, seg_p0, seg_p1, seg_r, seg_mask = [], [], [], [], []
    box_body, box_pos, box_rot, box_half, box_mask = [], [], [], [], []
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
                    # MuJoCo collision filtering: a geom with contype ==
                    # conaffinity == 0 never collides (the G1 marks its
                    # visual meshes this way)
                    ct = int(g.attrib.get("contype", "1"))
                    ca = int(g.attrib.get("conaffinity", "1"))
                    if ct == 0 and ca == 0:
                        continue
                    pos = np.asarray(_parse_vec(g, "pos", [0, 0, 0]), np.float64)
                    R = _quat_wxyz_to_mat(_parse_vec(g, "quat", [1, 0, 0, 0]))
                    if gtype == "sphere":
                        r = float(_parse_vec(g, "size", [0.01])[0])
                        seg_body.append(bi)
                        seg_p0.append(pos)
                        seg_p1.append(pos)
                        seg_r.append(r)
                    elif gtype in ("capsule", "cylinder"):
                        r = float(_parse_vec(g, "size", [0.01, 0.01])[0])
                        if "fromto" in g.attrib:
                            ft = np.asarray(
                                [float(v) for v in g.attrib["fromto"].split()],
                                np.float64,
                            )
                            a, b = ft[:3], ft[3:]
                        else:
                            hl = float(_parse_vec(g, "size", [0.01, 0.01])[1])
                            axis = R @ np.array([0.0, 0.0, 1.0])
                            a, b = pos - hl * axis, pos + hl * axis
                        seg_body.append(bi)
                        seg_p0.append(a)
                        seg_p1.append(b)
                        seg_r.append(r)
                    elif gtype == "box":
                        size = np.asarray(
                            _parse_vec(g, "size", [0.01, 0.01, 0.01]), np.float64
                        )
                        box_body.append(bi)
                        box_pos.append(pos)
                        box_rot.append(R)
                        box_half.append(size)
                    elif gtype == "mesh" and mesh_as_box:
                        from add_gym_tpu.native import stl_aabb

                        lo, hi = stl_aabb(os.path.join(
                            meshdir, g.attrib["mesh"] + ".STL"
                        ))
                        lo = np.asarray(lo, np.float64)
                        hi = np.asarray(hi, np.float64)
                        box_body.append(bi)
                        box_pos.append(pos + R @ (0.5 * (lo + hi)))
                        box_rot.append(R)
                        box_half.append(0.5 * (hi - lo))
                    # record collision masks for whichever list grew
                    while len(seg_mask) < len(seg_body):
                        seg_mask.append((ct, ca))
                    while len(box_mask) < len(box_body):
                        box_mask.append((ct, ca))
            walk(child, name)

    worldbody = tree.getroot().find("worldbody")
    if worldbody is not None:
        walk(worldbody, None)

    idx_to_name = {i: n for n, i in name_to_idx.items()}
    masses = np.asarray(masses, np.float64)

    def admissible(bi, bj, mi, mj):
        if bi == bj:
            return False
        # MuJoCo pair rule: (contype_i & conaffinity_j) | (contype_j &
        # conaffinity_i)
        if not ((mi[0] & mj[1]) or (mj[0] & mi[1])):
            return False
        if exclude_adjacent:
            ni, nj = idx_to_name[int(bi)], idx_to_name[int(bj)]
            if parent_of.get(ni) == nj or parent_of.get(nj) == ni:
                return False
        return True

    def pair_table(bodies_a, bodies_b, masks_a, masks_b, same: bool):
        pairs, stiff = [], []
        for i in range(len(bodies_a)):
            for j in range(i + 1 if same else 0, len(bodies_b)):
                bi, bj = bodies_a[i], bodies_b[j]
                if admissible(bi, bj, masks_a[i], masks_b[j]):
                    pairs.append((i, j))
                    stiff.append(min(masses[bi], masses[bj]))
        return (
            np.asarray(pairs, np.int32) if pairs else np.zeros((0, 2), np.int32),
            np.asarray(stiff, np.float32) if stiff else np.zeros((0,), np.float32),
        )

    ss_pairs, ss_mass = pair_table(seg_body, seg_body, seg_mask, seg_mask, same=True)
    sb_pairs, sb_mass = pair_table(seg_body, box_body, seg_mask, box_mask, same=False)
    bb_pairs, bb_mass = pair_table(box_body, box_body, box_mask, box_mask, same=True)

    def arr(x, shape, dt=np.float32):
        return np.asarray(x, dt) if len(x) else np.zeros(shape, dt)

    return GeomSet(
        seg_body=arr(seg_body, (0,), np.int32),
        seg_p0=arr(seg_p0, (0, 3)),
        seg_p1=arr(seg_p1, (0, 3)),
        seg_radius=arr(seg_r, (0,)),
        box_body=arr(box_body, (0,), np.int32),
        box_pos=arr(box_pos, (0, 3)),
        box_rot=arr(box_rot, (0, 3, 3)),
        box_half=arr(box_half, (0, 3)),
        ss_pairs=ss_pairs, ss_mass=ss_mass,
        sb_pairs=sb_pairs, sb_mass=sb_mass,
        bb_pairs=bb_pairs, bb_mass=bb_mass,
    )


def rest_pose_prune(gs: GeomSet, parent, local_pos, local_quat,
                    margin: float = 0.03) -> GeomSet:
    """Drop candidate pairs already proximate at the zero pose.

    Mesh-AABB boxes of neighbouring links overlap at rest (shoulder vs
    torso, pelvis vs thigh ...); keeping those pairs would make the robot
    permanently fight its own stance — the same rationale as the curated
    self-collision module's rest-pose pruning (model._build_self_collision).
    Pairs closer than ``margin`` (in surface distance) at the rest pose are
    removed.  Host-side numpy/one-shot jnp; build-time only.
    """
    import dataclasses

    from add_gym_tpu.physics.model import _quat_wxyz_to_mat

    nb = len(parent)
    pos = np.zeros((nb, 3))
    rot = np.zeros((nb, 3, 3))
    rot[0] = np.eye(3)
    for i in range(1, nb):
        p = int(parent[i])
        rot[i] = rot[p] @ _quat_wxyz_to_mat(np.asarray(local_quat[i], np.float64))
        pos[i] = pos[p] + rot[p] @ np.asarray(local_pos[i], np.float64)

    def seg_world(i):
        b = int(gs.seg_body[i])
        return (pos[b] + rot[b] @ gs.seg_p0[i], pos[b] + rot[b] @ gs.seg_p1[i])

    def box_world(i):
        b = int(gs.box_body[i])
        return (pos[b] + rot[b] @ gs.box_pos[i], rot[b] @ gs.box_rot[i])

    keep_ss = []
    for k, (i, j) in enumerate(np.asarray(gs.ss_pairs).reshape(-1, 2)):
        a0, a1 = seg_world(i)
        b0, b1 = seg_world(j)
        pa, pb = segment_closest_points(
            jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(b0), jnp.asarray(b1)
        )
        dist = float(np.linalg.norm(np.asarray(pa - pb)))
        if dist - (gs.seg_radius[i] + gs.seg_radius[j]) >= margin:
            keep_ss.append(k)

    keep_sb = []
    for k, (i, j) in enumerate(np.asarray(gs.sb_pairs).reshape(-1, 2)):
        a0, a1 = seg_world(i)
        c, Rw = box_world(j)
        al = Rw.T @ (a0 - c)
        bl = Rw.T @ (a1 - c)
        _, _, _, sd = segment_box_closest(
            jnp.asarray(al), jnp.asarray(bl), jnp.asarray(gs.box_half[j])
        )
        if float(sd) - gs.seg_radius[i] >= margin:
            keep_sb.append(k)

    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        np.float64,
    )

    def box_pair_min_sd(i, j):
        ci, Ri = box_world(i)
        cj, Rj = box_world(j)
        m = np.inf
        for (src_c, src_R, src_h, dst_c, dst_R, dst_h) in (
            (ci, Ri, gs.box_half[i], cj, Rj, gs.box_half[j]),
            (cj, Rj, gs.box_half[j], ci, Ri, gs.box_half[i]),
        ):
            vw = src_c[None] + (corners * src_h[None]) @ src_R.T
            vl = (vw - dst_c[None]) @ dst_R
            _, _, sd = box_surface_point(
                jnp.asarray(vl), jnp.broadcast_to(jnp.asarray(dst_h), vl.shape)
            )
            m = min(m, float(np.min(np.asarray(sd))))
        return m

    keep_bb = []
    for k, (i, j) in enumerate(np.asarray(gs.bb_pairs).reshape(-1, 2)):
        if box_pair_min_sd(int(i), int(j)) >= margin:
            keep_bb.append(k)

    def take(arr, idx, width=None):
        idx = np.asarray(idx, np.int32)
        return arr[idx] if len(idx) else arr[:0]

    return dataclasses.replace(
        gs,
        ss_pairs=take(gs.ss_pairs, keep_ss), ss_mass=take(gs.ss_mass, keep_ss),
        sb_pairs=take(gs.sb_pairs, keep_sb), sb_mass=take(gs.sb_mass, keep_sb),
        bb_pairs=take(gs.bb_pairs, keep_bb), bb_mass=take(gs.bb_mass, keep_bb),
    )


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
