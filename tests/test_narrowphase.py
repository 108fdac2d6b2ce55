"""Capsule-capsule narrowphase: geometry, force law, and G1 opt-in."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.narrowphase import (
    CapsuleSet, capsule_f_ext, capsule_pair_forces, parse_capsules,
    segment_closest_points,
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
