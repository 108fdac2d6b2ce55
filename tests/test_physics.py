"""Physics engine regression tests: free fall, energy, standing, crumple."""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics.engine import (
    EngineParams, default_state, step, forward_kinematics,
    _body_world_velocities,
)
from add_gym_tpu.utils.assets import asset_path


@pytest.fixture(scope="module")
def model():
    return build_physics_model(asset_path("g1_description/g1_29.xml"))


def reference_gains(model, scale=1.0):
    """PD gains mirroring robot.py:133-163 (x1.2 gain_scale from g1.yaml)."""
    kp = np.full(model.nd, 100.0)
    for i, n in enumerate(model.body_names[1:]):
        if "hip" in n:
            kp[i] = 80
        elif "knee" in n or "ankle" in n:
            kp[i] = 120
        else:
            kp[i] = 50
    kp *= 1.2 * scale
    kv = 2.0 * np.sqrt(kp)
    return jnp.asarray(kp, jnp.float32), jnp.asarray(kv, jnp.float32)


def standing_state(model, n=2, height_eps=1e-3):
    s = default_state(model, n)
    bp, br = forward_kinematics(model, s)
    cpw = bp[:, model.cp_body] + jnp.einsum(
        "npij,pj->npi", br[:, model.cp_body], jnp.asarray(model.cp_pos)
    )
    low = float((cpw[..., 2] - jnp.asarray(model.cp_radius)).min())
    return replace(s, root_pos=s.root_pos.at[:, 2].set(-low + height_eps))


def test_model_arrays(model):
    assert model.nb == 30 and model.nd == 29
    assert abs(float(model.mass.sum()) - 35.11) < 0.1
    assert model.ncp > 100
    # G1 foot pads are explicit sphere contacts
    feet = [i for i, n in enumerate(model.body_names) if "ankle_roll" in n]
    assert all(model.cp_explicit[np.isin(model.cp_body, feet)])


def test_free_fall(model):
    params = EngineParams(kp=jnp.zeros(29), kv=jnp.zeros(29))
    s = default_state(model, 2)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(50.0))
    s1, _ = jax.jit(lambda s: step(model, params, s, jnp.zeros((2, 29))))(s)
    np.testing.assert_allclose(np.asarray(s1.root_vel[:, 2]), -0.0981, atol=1e-4)
    assert float(jnp.abs(s1.dof_vel).max()) < 1e-6
    assert float(jnp.abs(s1.root_ang_vel).max()) < 1e-6


def test_free_space_energy(model):
    """Passive dynamics in free space must not gain energy (SURVEY §7.4.1)."""
    params = EngineParams(kp=jnp.zeros(29), kv=jnp.zeros(29))
    key = jax.random.PRNGKey(0)
    s = default_state(model, 1)
    s = replace(
        s,
        root_pos=s.root_pos.at[:, 2].set(100.0),
        dof_vel=1.5 * jax.random.normal(key, (1, 29)),
        root_ang_vel=jnp.array([[1.0, 1.5, 0.5]]),
    )

    def energy(s):
        bp, br = forward_kinematics(model, s)
        om, vel = _body_world_velocities(model, s, br)
        mass = jnp.asarray(model.mass)
        com_w = bp + jnp.einsum("nbij,bj->nbi", br, jnp.asarray(model.com))
        v_com = vel + jnp.cross(om, com_w - bp)
        ke = 0.5 * jnp.sum(mass[None] * jnp.sum(v_com**2, -1))
        om_b = jnp.einsum("nbji,nbj->nbi", br, om)
        ke += 0.5 * jnp.sum(
            jnp.einsum("nbi,bij,nbj->nb", om_b, jnp.asarray(model.inertia), om_b)
        )
        ke += 0.5 * jnp.sum(jnp.asarray(model.dof_armature) * s.dof_vel**2)
        pe = jnp.sum(mass[None] * 9.81 * com_w[..., 2])
        return float(ke + pe)

    stp = jax.jit(lambda s: step(model, params, s, jnp.zeros((1, 29))))
    e0 = energy(s)
    for _ in range(100):
        s, _ = stp(s)
    # joint damping/frictionloss remove energy; limit bounces may add a hair
    assert energy(s) < e0 * 1.01 + 10.0


def test_standing_stable(model):
    """With stiff PD gains the robot stands still for 2 simulated seconds."""
    kp, kv = reference_gains(model, scale=3.0)
    params = EngineParams(kp=kp, kv=kv)
    s = standing_state(model)
    stp = jax.jit(lambda s: step(model, params, s, jnp.zeros((2, 29))))
    for _ in range(200):
        s, contact = stp(s)
    assert float(s.root_pos[0, 2]) > 0.75
    assert float(s.root_quat[0, 0]) > 0.99
    assert float(jnp.linalg.norm(s.root_vel[0])) < 0.05
    # only feet touch the ground
    touching = np.where(np.asarray(contact[0]) > 0)[0]
    for b in touching:
        assert "ankle_roll" in model.body_names[b]


def test_fall_is_bounded(model):
    """With reference-scale gains the robot may fall; it must come to rest
    finite and on the ground (no energy ratchet, SURVEY §7.4.1)."""
    kp, kv = reference_gains(model, scale=1.0)
    params = EngineParams(kp=kp, kv=kv)
    s = standing_state(model)
    stp = jax.jit(lambda s: step(model, params, s, jnp.zeros((2, 29))))
    for _ in range(300):
        s, _ = stp(s)
    assert np.isfinite(np.asarray(s.root_pos)).all()
    assert float(s.root_pos[0, 2]) < 1.0
    assert float(jnp.linalg.norm(s.root_vel[0])) < 0.5


def test_pd_tracks_target(model):
    """PD control drives a joint to a commanded offset in free space."""
    kp, kv = reference_gains(model, scale=1.0)
    params = EngineParams(kp=kp, kv=kv)
    s = default_state(model, 1)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(100.0))
    tgt = jnp.zeros((1, 29)).at[0, 3].set(0.5)  # left knee to 0.5 rad
    stp = jax.jit(lambda s: step(model, params, s, tgt))
    for _ in range(100):
        s, _ = stp(s)
    knee = float(s.dof_pos[0, 3])
    assert abs(knee - 0.5) < 0.1


def test_slew_limiter(model):
    """PD target changes are rate-limited (mjwarp_engine.py:807-851)."""
    kp, kv = reference_gains(model)
    params = EngineParams(kp=kp, kv=kv, max_target_delta=0.5)
    s = default_state(model, 1)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(100.0))
    tgt = jnp.full((1, 29), 10.0)  # far beyond limits
    s1, _ = jax.jit(lambda s: step(model, params, s, tgt))(s)
    # one step can move the target at most 0.5 rad from 0
    assert float(jnp.abs(s1.pd_target).max()) <= 0.5 + 1e-5


def test_contact_flags_on_drop(model):
    """Dropping flat on the ground produces contacts on many bodies."""
    params = EngineParams(kp=jnp.zeros(29), kv=jnp.zeros(29))
    s = default_state(model, 1)
    quat = jnp.array([[0.7071, 0.0, 0.7071, 0.0]])  # lying on its face
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(0.3), root_quat=quat)
    stp = jax.jit(lambda s: step(model, params, s, jnp.zeros((1, 29))))
    seen = np.zeros(model.nb, bool)
    for _ in range(100):
        s, contact = stp(s)
        seen |= np.asarray(contact[0]) > 0
    assert seen.sum() >= 3  # multiple bodies touched ground


def test_contact_pairs_query(model):
    """Generic who-touched-whom surface (ref base_engine.py:300-319)."""
    from dataclasses import replace as dc_replace

    from add_gym_tpu.physics.engine import GROUND, contact_pairs

    kp, kv = reference_gains(model)
    params = EngineParams(kp=kp, kv=kv)
    s = standing_state(model, n=2, height_eps=-2e-3)  # slight penetration
    # env 1 in the air: no ground contact there
    s = dc_replace(s, root_pos=s.root_pos.at[1, 2].set(3.0))
    out = jax.jit(lambda s: contact_pairs(model, params, s))(s)

    Q = out["link_a"].shape[0]
    assert out["force"].shape == (2, Q) and out["valid"].shape == (2, Q)
    assert (out["link_b"] == GROUND).sum() > 0        # ground pairs exist
    assert (out["link_b"] >= 0).sum() > 0             # self pairs exist

    ground = out["link_b"] == GROUND
    feet = [i for i, n in enumerate(model.body_names) if "ankle_roll" in n]
    v0 = np.asarray(out["valid"][0])
    touching = set(np.asarray(out["link_a"])[ground & v0])
    assert set(feet) <= touching                      # standing on both feet
    assert not np.asarray(out["valid"][1])[ground].any()  # airborne env clean
