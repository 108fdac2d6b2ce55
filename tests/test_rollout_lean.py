"""Internal invariants of the lean train rollout (ADDAgent.rollout_lean).

The lean path records derived quantities (normalized obs, normalized
action, disc difference) instead of raw trajectories, and accumulates
obs-normalizer statistics in the scan carry.  Its RNG stream differs from
the rich ``rollout`` by design, so the two cannot be compared
trajectory-for-trajectory; learning-level equivalence is pinned by the
262M-sample A/B arms (docs/runs/ab_r5/).  These tests pin the
machine-checkable invariants:

* recorded a_logp equals log_prob recomputed from the recorded
  (norm_obs, norm_a) through the same actor — the epoch-0 PPO ratio is
  exactly 1;
* the in-scan obs statistics equal the statistics of the recorded
  observations (reconstructed through the frozen normalizer);
* the traj layout matches what build_train_data/update consume.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.builder import build_agent, build_env
from add_gym_tpu.learning import distributions as dist
from add_gym_tpu.learning import normalizer as norm
from add_gym_tpu.learning.networks import ADDNet
from add_gym_tpu.utils.config import load_config

N, T = 4, 5


@pytest.fixture(scope="module")
def stack():
    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = T
    cfg["agent"]["mixed_precision"] = False  # f32 so invariants are exact
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)
    es2, obs2, traj, obs_stats = jax.jit(
        lambda ts, es, obs, k: agent.rollout_lean(ts, es, obs, k, T)
    )(ts, es, obs, jax.random.PRNGKey(3))
    return dict(agent=agent, ts=ts, obs0=obs, traj=traj, stats=obs_stats)


def test_lean_traj_layout(stack):
    traj = stack["traj"]
    agent = stack["agent"]
    d = agent.env.obs_dim()
    assert traj["norm_obs"].shape == (T, N, d)
    assert traj["norm_next"].shape == (T, N, d)
    assert traj["norm_a"].shape == (T, N, agent.env.num_dofs)
    # ADD mode records only the disc difference
    assert "disc_diff" in traj and "disc_obs" not in traj
    assert traj["disc_diff"].shape == (T, N, agent.env.disc_obs_dim())
    # f32 run: recorded normalized obs stay f32
    assert traj["norm_obs"].dtype == jnp.float32


def test_lean_a_logp_is_exact_epoch0_ratio(stack):
    """log_prob recomputed from the recorded (norm_obs, norm_a) through
    the same actor equals the recorded a_logp — the update's epoch-0
    importance ratio is exactly exp(0)."""
    agent, ts, traj = stack["agent"], stack["ts"], stack["traj"]
    flat_obs = traj["norm_obs"].reshape(T * N, -1)
    flat_a = traj["norm_a"].reshape(T * N, -1)
    mean, logstd = agent._ac_apply(ts.params, flat_obs, ADDNet.actor)
    if logstd is None:
        logstd = jnp.full_like(mean, agent.logstd)
    logp = dist.log_prob(mean, logstd, flat_a)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(traj["a_logp"]).reshape(-1),
        rtol=1e-6, atol=1e-6,
    )


def test_lean_obs_stats_match_recorded_obs(stack):
    """The in-scan (count, sum, sum-sq) equals the statistics of the
    acting observations, reconstructed by un-normalizing the recorded
    norm_obs through the frozen normalizer (f32 run)."""
    agent, ts, traj = stack["agent"], stack["ts"], stack["traj"]
    cnt, s, s_sq = stack["stats"]
    assert int(cnt) == T * N
    obs_rec = norm.unnormalize(
        ts.obs_norm, traj["norm_obs"].reshape(T * N, -1)
    )
    np.testing.assert_allclose(
        np.asarray(s), np.asarray(jnp.sum(obs_rec, axis=0)),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(s_sq), np.asarray(jnp.sum(jnp.square(obs_rec), axis=0)),
        rtol=2e-3, atol=2e-3,
    )


def test_lean_feeds_build_and_update(stack):
    agent, ts, traj = stack["agent"], stack["ts"], stack["traj"]
    ts2, data, info = jax.jit(
        lambda ts, traj: agent.build_train_data(ts, traj)
    )(ts, traj)
    assert data["norm_a"] is traj["norm_a"] or data["norm_a"].shape == traj["norm_a"].shape
    for k in ("tar_val", "adv", "disc_in"):
        assert k in data
    assert np.isfinite(float(info["adv_mean"]))
