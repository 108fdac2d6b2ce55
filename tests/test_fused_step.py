"""Parity of the stacked env-minor fused physics step against the engine.

The fused path (physics/fused_step.py) is a pure re-layout of
physics/engine.py — identical math, env-minor stacked tensors.  These tests
pin that equivalence on realistic states (standing with contacts, free
fall, random airborne spins) so the fast path can be used for training.

EngineParams is passed as a traced pytree argument so each engine compiles
exactly once for the whole module (compile cost matters: 1-core CPU host).
"""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.physics import engine as eng
from add_gym_tpu.physics.fused_step import FusedModelConstants, fused_step
from add_gym_tpu.utils.assets import asset_path

from tests.test_physics import reference_gains, standing_state

N = 4  # all tests share this batch size so each engine compiles once


@pytest.fixture(scope="module")
def model():
    return build_physics_model(asset_path("g1_description/g1_29.xml"))


@pytest.fixture(scope="module")
def steppers(model):
    fc = FusedModelConstants(model)
    ref = jax.jit(lambda p, s, t: eng.step(model, p, s, t))
    soa = jax.jit(lambda p, s, t: fused_step(fc, p, s, t))
    return ref, soa


def _params(model, scale=1.0):
    kp, kv = reference_gains(model, scale=scale)
    return eng.EngineParams(kp=kp, kv=kv)


def assert_state_close(a, b, atol):
    for name in ("root_pos", "root_quat", "root_vel", "root_ang_vel",
                 "dof_pos", "dof_vel", "pd_target"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            atol=atol, err_msg=name,
        )


def test_fused_matches_engine_standing(model, steppers):
    ref_step, soa_step = steppers
    params = _params(model, scale=3.0)
    s = standing_state(model, n=N)
    key = jax.random.PRNGKey(0)
    s = replace(
        s,
        dof_vel=0.3 * jax.random.normal(key, s.dof_vel.shape),
        root_vel=0.1 * jax.random.normal(jax.random.fold_in(key, 1), (N, 3)),
    )
    tgt = 0.1 * jax.random.normal(jax.random.fold_in(key, 2), (N, model.nd))

    s_ref, c_ref = ref_step(params, s, tgt)
    s_soa, c_soa = soa_step(params, s, tgt)
    assert_state_close(s_ref, s_soa, atol=2e-4)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_soa), atol=2e-2)


def test_fused_matches_engine_trajectory(model, steppers):
    """20 control steps of divergence stays within float-accumulation noise."""
    ref_step, soa_step = steppers
    params = _params(model, scale=3.0)
    s = standing_state(model, n=N)
    tgt = jnp.zeros((N, model.nd)).at[:, 3].set(0.3)

    s_ref = s_soa = s
    for _ in range(20):
        s_ref, _ = ref_step(params, s_ref, tgt)
        s_soa, _ = soa_step(params, s_soa, tgt)
    np.testing.assert_allclose(
        np.asarray(s_ref.root_pos), np.asarray(s_soa.root_pos), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(s_ref.dof_pos), np.asarray(s_soa.dof_pos), atol=5e-3
    )


def test_fused_free_fall(model, steppers):
    _, soa_step = steppers
    params = eng.EngineParams(kp=jnp.zeros(29), kv=jnp.zeros(29))
    s = eng.default_state(model, N)
    s = replace(s, root_pos=s.root_pos.at[:, 2].set(50.0))
    s1, _ = soa_step(params, s, jnp.zeros((N, 29)))
    np.testing.assert_allclose(np.asarray(s1.root_vel[:, 2]), -0.0981, atol=1e-4)
    assert float(jnp.abs(s1.dof_vel).max()) < 1e-5


def test_fused_random_state_parity(model, steppers):
    """Random airborne state with spins: one step must agree."""
    ref_step, soa_step = steppers
    params = _params(model)
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 6)
    s = eng.default_state(model, N)
    lim = jnp.asarray(model.dof_limit)
    mid = 0.5 * (lim[:, 0] + lim[:, 1])
    s = replace(
        s,
        root_pos=jnp.concatenate(
            [jax.random.normal(ks[0], (N, 2)), jnp.full((N, 1), 5.0)], -1
        ),
        root_quat=rotq(ks[1], N),
        root_vel=jax.random.normal(ks[2], (N, 3)),
        root_ang_vel=jax.random.normal(ks[3], (N, 3)),
        dof_pos=mid + 0.2 * jax.random.normal(ks[4], (N, model.nd)),
        dof_vel=jax.random.normal(ks[5], (N, model.nd)),
    )
    tgt = s.dof_pos

    s_ref, _ = ref_step(params, s, tgt)
    s_soa, _ = soa_step(params, s, tgt)
    assert_state_close(s_ref, s_soa, atol=5e-4)


def rotq(key, n):
    import add_gym_tpu.mathx.rotations as rot

    v = jax.random.normal(key, (n, 3))
    return rot.exp_map_to_quat(v)
