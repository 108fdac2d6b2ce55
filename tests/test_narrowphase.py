"""Narrowphase collision: geometry queries, force law, and G1 opt-in."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.narrowphase import (
    CapsuleSet, GeomSet, box_surface_point, capsule_f_ext,
    capsule_pair_forces, geom_f_ext, parse_capsules, parse_geoms,
    segment_box_closest, segment_closest_points,
)


def _brute_force_dist(a0, a1, b0, b1, n=400):
    s = np.linspace(0, 1, n)[:, None]
    pa = a0[None] + s * (a1 - a0)[None]
    pb = b0[None] + s * (b1 - b0)[None]
    d = np.linalg.norm(pa[:, None, :] - pb[None, :, :], axis=-1)
    return d.min()


def test_segment_closest_points_matches_brute_force():
    rng = np.random.RandomState(0)
    cases = []
    for _ in range(24):
        cases.append(rng.randn(4, 3))
    # adversarial configurations: parallel, collinear, degenerate points
    cases.append(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], float))
    cases.append(np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], float))
    cases.append(np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1], [1, 1, 1]], float))
    cases.append(np.array([[0, 0, 0], [1, 0, 0], [.5, .3, 0], [.5, .3, 0]], float))
    arr = np.stack(cases)

    pa, pb = segment_closest_points(
        jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]),
        jnp.asarray(arr[:, 2]), jnp.asarray(arr[:, 3]),
    )
    dist = np.linalg.norm(np.asarray(pa - pb), axis=-1)
    for i, c in enumerate(cases):
        ref = _brute_force_dist(*c)
        assert dist[i] <= ref + 1e-4, (i, dist[i], ref)
        # never below the true minimum (sampling gives an upper bound)
        assert dist[i] >= ref - 5e-3, (i, dist[i], ref)


def _two_capsule_set():
    # crossing capsules on two different bodies (non-G1 synthetic robot)
    return CapsuleSet(
        body=np.array([0, 1], np.int32),
        p0=np.array([[-0.2, 0, 0], [0, -0.2, 0]], np.float32),
        p1=np.array([[0.2, 0, 0], [0, 0.2, 0]], np.float32),
        radius=np.array([0.05, 0.05], np.float32),
        pairs=np.array([[0, 1]], np.int32),
        stiff_mass=np.array([1.0], np.float32),
    )


def _fk(z_sep):
    """Two bodies: A at origin, B above it by z_sep (identity rotations)."""
    body_pos = jnp.asarray([[[0, 0, 0], [0, 0, z_sep]]], jnp.float32)
    body_rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 2, 3, 3))
    zeros = jnp.zeros((1, 2, 3), jnp.float32)
    return body_pos, body_rot, zeros, zeros


def test_crossing_capsules_repel():
    caps = _two_capsule_set()
    # penetrating: separation 0.06 < r_a + r_b = 0.10
    f, pa, pb, fmag = capsule_pair_forces(
        caps, *_fk(0.06), dt=0.0025, contact_timeconst=0.02
    )
    assert float(fmag[0, 0]) > 0.0
    # force on A points away from B (down, -z)
    assert float(f[0, 0, 2]) < 0.0
    np.testing.assert_allclose(np.asarray(pa[0, 0, :2]), 0.0, atol=1e-6)

    # separated: no force
    _, _, _, fmag2 = capsule_pair_forces(
        caps, *_fk(0.2), dt=0.0025, contact_timeconst=0.02
    )
    assert float(fmag2[0, 0]) == 0.0


def test_capsule_f_ext_newton_third_law():
    caps = _two_capsule_set()
    f_ext = capsule_f_ext(
        caps, *_fk(0.05), dt=0.0025, contact_timeconst=0.02, nb=2
    )
    # net force over both bodies cancels
    np.testing.assert_allclose(
        np.asarray(jnp.sum(f_ext[0, :, 3:6], axis=0)), 0.0, atol=1e-5
    )
    # damping: closing velocity increases the repulsion
    body_pos, body_rot, _, _ = _fk(0.05)
    v = jnp.asarray([[[0, 0, 0.5], [0, 0, -0.5]]], jnp.float32)  # closing
    _, _, _, fmag_static = capsule_pair_forces(
        caps, body_pos, body_rot, jnp.zeros_like(v), jnp.zeros_like(v),
        dt=0.0025, contact_timeconst=0.02,
    )
    _, _, _, fmag_closing = capsule_pair_forces(
        caps, body_pos, body_rot, jnp.zeros_like(v), v,
        dt=0.0025, contact_timeconst=0.02,
    )
    assert float(fmag_closing[0, 0]) > float(fmag_static[0, 0])


# ---------------------------------------------------------------- GeomSet


def test_box_surface_point_outside_inside():
    h = jnp.asarray([1.0, 2.0, 0.5])
    # outside: closest face point and positive distance
    q, n, sd = box_surface_point(jnp.asarray([3.0, 0.0, 0.0]), h)
    np.testing.assert_allclose(np.asarray(q), [1.0, 0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(n), [1.0, 0.0, 0.0], atol=1e-6)
    assert abs(float(sd) - 2.0) < 1e-5
    # outside a corner
    q, n, sd = box_surface_point(jnp.asarray([2.0, 3.0, 1.5]), h)
    np.testing.assert_allclose(np.asarray(q), [1.0, 2.0, 0.5], atol=1e-6)
    assert abs(float(sd) - np.sqrt(3.0)) < 1e-5
    # inside: push-out through the nearest face (here z, distance 0.1)
    q, n, sd = box_surface_point(jnp.asarray([0.2, -0.3, 0.4]), h)
    np.testing.assert_allclose(np.asarray(n), [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), [0.2, -0.3, 0.5], atol=1e-6)
    assert abs(float(sd) + 0.1) < 1e-5


def test_segment_box_closest_matches_brute_force():
    rng = np.random.RandomState(3)
    h = np.array([0.5, 0.4, 0.3])
    for _ in range(20):
        a, b = rng.randn(3) * 1.5, rng.randn(3) * 1.5
        p, q, n, sd = segment_box_closest(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(h)
        )
        # brute force: sample the segment, clamp each point to the box
        t = np.linspace(0, 1, 2000)[:, None]
        pts = a[None] + t * (b - a)[None]
        cl = np.clip(pts, -h, h)
        ref = np.linalg.norm(pts - cl, axis=-1).min()
        got = float(sd)
        if ref > 1e-6:  # both endpoints outside and segment misses the box
            assert abs(got - ref) < 2e-2, (got, ref)
            assert got >= ref - 1e-4  # never below the true minimum


def _two_box_set():
    """Two unit-ish boxes on two bodies, plus a sphere segment on body 0."""
    return GeomSet(
        seg_body=np.array([0], np.int32),
        seg_p0=np.array([[0.0, 0.0, 0.3]], np.float32),
        seg_p1=np.array([[0.0, 0.0, 0.3]], np.float32),
        seg_radius=np.array([0.1], np.float32),
        box_body=np.array([0, 1], np.int32),
        box_pos=np.zeros((2, 3), np.float32),
        box_rot=np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)).copy(),
        # B wider than A so penetrating vertices land strictly inside faces
        # (identical aligned boxes put vertices exactly ON the faces — a
        # measure-zero configuration the vertex model correctly reports as
        # zero-penetration)
        box_half=np.array([[0.2, 0.2, 0.2], [0.3, 0.3, 0.2]], np.float32),
        ss_pairs=np.zeros((0, 2), np.int32), ss_mass=np.zeros((0,), np.float32),
        sb_pairs=np.array([[0, 1]], np.int32), sb_mass=np.array([1.0], np.float32),
        bb_pairs=np.array([[0, 1]], np.int32), bb_mass=np.array([1.0], np.float32),
    )


def test_geom_f_ext_box_contacts():
    gs = _two_box_set()
    # body 1 hovers above body 0 with its box overlapping A's box (z_sep
    # 0.35 < 0.4 = sum of half-heights) and A's sphere (at z 0.3, r 0.1)
    # penetrating B's box bottom face (z 0.15)
    body_pos, body_rot, zeros, _ = _fk(0.35)
    f_ext = geom_f_ext(
        gs, body_pos, body_rot, zeros, zeros, dt=0.0025,
        contact_timeconst=0.02, nb=2,
    )
    f_ext = np.asarray(f_ext)
    # Newton's third law across all contact kinds
    np.testing.assert_allclose(f_ext[0, :, 3:6].sum(axis=0), 0.0, atol=1e-3)
    # boxes + sphere push body 1 up, body 0 down
    assert f_ext[0, 1, 5] > 0.0
    assert f_ext[0, 0, 5] < 0.0

    # fully separated: zero forces
    body_pos, body_rot, zeros, _ = _fk(1.0)
    f_ext2 = np.asarray(geom_f_ext(
        gs, body_pos, body_rot, zeros, zeros, dt=0.0025,
        contact_timeconst=0.02, nb=2,
    ))
    np.testing.assert_allclose(f_ext2, 0.0, atol=1e-7)


def test_geom_f_ext_jits_and_grads():
    # sphere (body 0, at origin, r 0.1) under a box (body 1, bottom face at
    # z - 0.2): shallow-contact regime where the push direction is
    # unambiguous, so force is smooth and monotone in separation
    gs = GeomSet(
        seg_body=np.array([0], np.int32),
        seg_p0=np.zeros((1, 3), np.float32),
        seg_p1=np.zeros((1, 3), np.float32),
        seg_radius=np.array([0.1], np.float32),
        box_body=np.array([1], np.int32),
        box_pos=np.zeros((1, 3), np.float32),
        box_rot=np.eye(3, dtype=np.float32)[None].copy(),
        box_half=np.array([[0.3, 0.3, 0.2]], np.float32),
        ss_pairs=np.zeros((0, 2), np.int32), ss_mass=np.zeros((0,), np.float32),
        sb_pairs=np.array([[0, 0]], np.int32), sb_mass=np.array([1.0], np.float32),
        bb_pairs=np.zeros((0, 2), np.int32), bb_mass=np.zeros((0,), np.float32),
    )

    @jax.jit
    def up_force_on_box(z):
        body_pos = jnp.stack([
            jnp.zeros((1, 3)),
            jnp.concatenate([jnp.zeros((1, 2)), z[None, None]], -1)[0][None],
        ], axis=1)
        body_rot = jnp.broadcast_to(jnp.eye(3), (1, 2, 3, 3))
        zeros = jnp.zeros((1, 2, 3))
        f = geom_f_ext(gs, body_pos, body_rot, zeros, zeros,
                       dt=0.0025, contact_timeconst=0.02, nb=2)
        return f[0, 1, 5]

    f_close = float(up_force_on_box(jnp.asarray(0.25)))   # pen 0.05
    f_far = float(up_force_on_box(jnp.asarray(0.28)))     # pen 0.02
    assert f_close > f_far > 0.0
    assert float(up_force_on_box(jnp.asarray(0.35))) == 0.0  # separated
    # differentiable: raising the box reduces the upward force
    g = float(jax.grad(up_force_on_box)(jnp.asarray(0.26)))
    assert g < 0.0


def test_parse_geoms_mixed_mjcf(tmp_path):
    mjcf = tmp_path / "mixed.xml"
    mjcf.write_text("""
<mujoco>
  <worldbody>
    <body name="a" pos="0 0 1">
      <geom type="sphere" size="0.1"/>
      <geom type="capsule" fromto="0 0 0  0 0 0.4" size="0.05"/>
      <body name="b" pos="0 0 0.5">
        <geom type="box" size="0.1 0.2 0.3"/>
      </body>
      <body name="c" pos="0.5 0 0">
        <geom type="box" size="0.1 0.1 0.1"/>
        <geom type="cylinder" size="0.03 0.2"/>
      </body>
    </body>
  </worldbody>
</mujoco>
""")
    gs = parse_geoms(str(mjcf), ["a", "b", "c"], [1.0, 2.0, 3.0])
    assert gs.seg_body.tolist() == [0, 0, 2]        # sphere, capsule, cylinder
    assert gs.box_body.tolist() == [1, 2]
    np.testing.assert_allclose(gs.seg_p1[1], [0, 0, 0.4], atol=1e-6)
    np.testing.assert_allclose(gs.box_half[0], [0.1, 0.2, 0.3], atol=1e-6)
    # parent-child (a,b) and (a,c) excluded; (b,c) boxes admissible
    pair_bodies = {
        (int(gs.seg_body[i]), int(gs.box_body[j])) for i, j in gs.sb_pairs
    }
    assert (0, 1) not in pair_bodies        # a segments vs b box: adjacent
    assert (0, 2) not in pair_bodies        # a vs c: adjacent
    assert (2, 1) in pair_bodies            # c cylinder vs b box
    assert gs.bb_pairs.shape[0] == 1        # b box vs c box
    # stiffness = min mass of the pair
    np.testing.assert_allclose(gs.bb_mass, [2.0])


def test_g1_geoms_opt_in(g1_xml):
    """General narrowphase on G1: parses, steps finite, hot path untouched."""
    from dataclasses import replace

    from add_gym_tpu.physics.engine import EngineParams, default_state, step
    from add_gym_tpu.physics.model import attach_geoms, build_physics_model

    model = build_physics_model(g1_xml)
    assert model.geoms is None
    model_g = attach_geoms(model, g1_xml)
    gs = model_g.geoms
    assert gs is not None
    if gs.num_pairs == 0:
        pytest.skip("G1 MJCF exposes no primitive collision geoms")
    params = EngineParams(
        kp=jnp.full((model.nd,), 80.0), kv=jnp.full((model.nd,), 4.0)
    )
    state = default_state(model_g, 2)
    state = replace(state, root_pos=state.root_pos.at[:, 2].set(0.793))
    out, contact = step(model_g, params, state, state.dof_pos)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_g1_geoms_filtering_and_rest_neutrality(g1_xml):
    """contype/conaffinity filtering excludes the G1's visual meshes, and
    the rest-pose-pruned pair table produces ZERO force in the standing
    pose — the robot must not fight its own stance."""
    from dataclasses import replace

    from add_gym_tpu.physics.engine import (
        _body_world_velocities, default_state, forward_kinematics,
    )
    from add_gym_tpu.physics.model import attach_geoms, build_physics_model
    from add_gym_tpu.physics.narrowphase import parse_geoms

    model = build_physics_model(g1_xml)
    unfiltered = parse_geoms(g1_xml, model.body_names, model.mass)
    # the G1 marks 36 visual meshes contype=0 conaffinity=0; with
    # mesh-as-AABB-box parsing they must NOT appear as collidable boxes
    assert unfiltered.box_body.shape[0] < 36

    model_g = attach_geoms(model, g1_xml)
    gs = model_g.geoms
    assert 0 < gs.num_pairs < unfiltered.num_pairs + 1

    state = default_state(model_g, 1)
    state = replace(state, root_pos=state.root_pos.at[:, 2].set(0.793))
    bp, br = forward_kinematics(model_g, state)
    om, vo = _body_world_velocities(model_g, state, br)
    f = geom_f_ext(gs, bp, br, om, vo, 0.0025, 0.02, model_g.nb)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-8)


def test_g1_capsule_opt_in(g1_xml):
    """G1: capsules parse from the MJCF; the default model carries none
    (hot paths unaffected); the opted-in engine path still steps finite."""
    from add_gym_tpu.physics.engine import (
        EngineParams, default_state, step,
    )
    from add_gym_tpu.physics.model import attach_capsules, build_physics_model

    model = build_physics_model(g1_xml)
    assert model.capsules is None

    model_c = attach_capsules(model, g1_xml)
    caps = model_c.capsules
    assert caps is not None
    # pair table is static and excludes parent-child body pairs
    for i, j in np.asarray(caps.pairs):
        assert caps.body[i] != caps.body[j]

    if caps.num_pairs == 0:
        pytest.skip("G1 MJCF exposes no capsule collision geoms")
    params = EngineParams(
        kp=jnp.full((model.nd,), 80.0), kv=jnp.full((model.nd,), 4.0)
    )
    from dataclasses import replace

    state = default_state(model_c, 2)
    state = replace(state, root_pos=state.root_pos.at[:, 2].set(0.793))
    out, contact = step(model_c, params, state, state.dof_pos)
    for leaf in jax.tree_util.tree_leaves(out):
        assert np.isfinite(np.asarray(leaf)).all()


def test_fused_geom_parity(g1_xml):
    """The fused path evaluates geom narrowphase as held per-control-step
    wrenches (fused_step.compute_np_ext) — identical math to the engine
    path's held block, env-minor layout.  Pin the equivalence on a
    perturbed standing state where mesh-AABB pairs are active."""
    from dataclasses import replace

    from add_gym_tpu.physics import engine as eng
    from add_gym_tpu.physics.fused_step import FusedModelConstants, fused_step
    from add_gym_tpu.physics.model import attach_geoms, build_physics_model

    from tests.test_physics import reference_gains, standing_state

    model = attach_geoms(build_physics_model(g1_xml), g1_xml)
    assert model.geoms.num_pairs > 0
    fc = FusedModelConstants(model)
    kp, kv = reference_gains(model, scale=3.0)
    params = eng.EngineParams(kp=kp, kv=kv, self_collision=True)

    n = 4
    key = jax.random.PRNGKey(3)
    s = standing_state(model, n=n)
    # bend enough that thigh/torso mesh boxes approach each other
    s = replace(
        s,
        dof_pos=s.dof_pos + 0.2 * jax.random.normal(key, s.dof_pos.shape),
        dof_vel=0.5 * jax.random.normal(jax.random.fold_in(key, 1),
                                        s.dof_vel.shape),
    )
    tgt = s.dof_pos

    ref_step = jax.jit(lambda p, st, t: eng.step(model, p, st, t))
    soa_step = jax.jit(lambda p, st, t: fused_step(fc, p, st, t))
    s_ref, c_ref = s, None
    s_soa, c_soa = s, None
    for _ in range(3):
        s_ref, c_ref = ref_step(params, s_ref, tgt)
        s_soa, c_soa = soa_step(params, s_soa, tgt)
    for name in ("root_pos", "root_quat", "root_vel", "root_ang_vel",
                 "dof_pos", "dof_vel"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_soa, name)),
            atol=5e-4, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_soa), atol=5e-2)


def test_pallas_geom_parity(g1_xml):
    """The Pallas kernel consumes geom narrowphase as a held
    [6*n_touched, N] wrench input evaluated outside the kernel
    (pallas_step np_rows) — same held-wrench semantics as the fused path.
    Pin kernel-vs-fused equivalence on a perturbed state with active
    mesh-AABB pairs (interpret mode: plain-JAX evaluation of the kernel)."""
    from dataclasses import replace

    from add_gym_tpu.physics import engine as eng
    from add_gym_tpu.physics.fused_step import FusedModelConstants, fused_step
    from add_gym_tpu.physics.model import attach_geoms, build_physics_model
    from add_gym_tpu.physics.pallas_step import pallas_step

    from tests.test_physics import reference_gains, standing_state

    model = attach_geoms(build_physics_model(g1_xml), g1_xml)
    assert model.geoms.num_pairs > 0
    fc = FusedModelConstants(model)
    kp, kv = reference_gains(model, scale=3.0)
    params = eng.EngineParams(kp=kp, kv=kv, self_collision=True)

    n = 4
    key = jax.random.PRNGKey(3)
    s = standing_state(model, n=n)
    s = replace(
        s,
        dof_pos=s.dof_pos + 0.2 * jax.random.normal(key, s.dof_pos.shape),
        dof_vel=0.5 * jax.random.normal(jax.random.fold_in(key, 1),
                                        s.dof_vel.shape),
    )
    tgt = s.dof_pos

    soa_step = jax.jit(lambda p, st, t: fused_step(fc, p, st, t))
    pal_step = jax.jit(
        lambda p, st, t: pallas_step(fc, p, st, t, interpret=True)
    )
    s_soa, c_soa = s, None
    s_pal, c_pal = s, None
    for _ in range(3):
        s_soa, c_soa = soa_step(params, s_soa, tgt)
        s_pal, c_pal = pal_step(params, s_pal, tgt)
    for name in ("root_pos", "root_quat", "root_vel", "root_ang_vel",
                 "dof_pos", "dof_vel"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_soa, name)), np.asarray(getattr(s_pal, name)),
            atol=5e-4, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(c_soa), np.asarray(c_pal), atol=5e-2)


def test_builder_general_narrowphase_flag():
    """engine.general_narrowphase=true routes through the builder: geoms
    attached, every backend (incl. the Pallas kernel via its held-wrench
    input) stays available, and the env steps finite."""
    from add_gym_tpu.builder import build_env
    from add_gym_tpu.learning.sampler import init_sampler
    from add_gym_tpu.utils.config import load_config

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["general_narrowphase"] = True
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    env = build_env(cfg)
    assert env.model.geoms is not None and env.model.geoms.num_pairs > 0
    assert env.fused and not env.pallas

    sampler = init_sampler(env.motion.num_motions, env.task.sampler_num_segments)
    es = env.reset_where(
        jax.random.PRNGKey(0), env.init_state(4), jnp.ones(4, bool), sampler
    )
    obs = env.compute_obs(es)
    tgt = es.sim.dof_pos
    for _ in range(3):
        es, *_ = env.step(es, tgt)
    obs = env.compute_obs(es)
    for leaf in jax.tree_util.tree_leaves((es, obs)):
        assert np.isfinite(np.asarray(leaf)).all()
