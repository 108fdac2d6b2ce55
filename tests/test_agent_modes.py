"""Agent modes: ADD (default), AMP, and plain PPO all train end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.builder import build_agent, build_env
from add_gym_tpu.utils.config import load_config


def _small_cfg(agent_group):
    cfg = load_config("train", overrides=[f"agent={agent_group}"])
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = False  # fast compile on the 1-core CPU host
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    # small nets: mode semantics (param trees, losses, normalizers) are
    # net-size independent; 64-unit MLPs compile ~10x faster on the 1-core
    # CPU CI host (flagship 1024-wide nets are covered on-TPU by bench.py)
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    return cfg


def _one_iter(cfg):
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    ts = agent.init_train_state()
    es = env.init_state(4)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(4, bool), ts.sampler)
    obs = env.compute_obs(es)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(1))
    return agent, ts, {k: float(v) for k, v in jax.device_get(info).items()}


def test_amp_mode_trains():
    agent, ts, info = _one_iter(_small_cfg("amp_g1"))
    assert np.isfinite(info["loss"])
    assert "disc_loss" in info and np.isfinite(info["disc_loss"])
    # amp uses a running mean/std normalizer on disc obs
    from add_gym_tpu.learning.normalizer import NormState

    assert isinstance(ts.disc_norm, NormState)
    assert float(ts.disc_norm.count) > 0


def test_ppo_mode_trains_without_disc():
    agent, ts, info = _one_iter(_small_cfg("ppo_g1"))
    assert np.isfinite(info["loss"])
    assert "disc_loss" not in info
    # no discriminator parameters at all
    assert "disc_trunk" not in ts.params["params"]
    # reward comes from the task term
    assert info["task_reward_mean"] != 0.0


def test_ppo_reward_is_task_reward():
    cfg = _small_cfg("ppo_g1")
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    assert agent.cfg.disc_mode == "none"
    assert agent.cfg.task_reward_weight == 1.0


@pytest.mark.slow
def test_std_type_variants():
    """StdType constant/variable (distribution_gaussian_diag.py:6-9)."""
    for std_type in ("constant", "variable"):
        cfg = _small_cfg("add_g1")
        cfg["agent"]["actor_std_type"] = std_type
        agent, ts, info = _one_iter(cfg)
        assert np.isfinite(info["loss"]), std_type
        if std_type == "constant":
            assert "actor_logstd" in ts.params["params"]
        else:
            assert "actor_logstd_head" in ts.params["params"]


def test_cnn_trunk_forward():
    """cnn_3conv_1fc_0 registry entry (reference nets/cnn_3conv_1fc_0.py)."""
    from add_gym_tpu.learning.networks import build_trunk

    net = build_trunk("cnn_3conv_1fc_0")
    x = jnp.zeros((2, 84, 84, 4))
    params = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(params, x)
    assert out.shape == (2, 512)


def test_categorical_distribution():
    from add_gym_tpu.learning import distributions as dist

    logits = jnp.asarray([[2.0, 0.0, -1.0], [0.0, 3.0, 0.0]])
    assert list(np.asarray(dist.categorical_mode(logits))) == [0, 1]
    x = dist.categorical_sample(jax.random.PRNGKey(0), logits)
    lp = dist.categorical_log_prob(logits, x)
    assert lp.shape == (2,) and np.all(np.asarray(lp) <= 0)
    ent = dist.categorical_entropy(logits)
    assert np.all(np.asarray(ent) > 0)


def test_exp_prob_annealing():
    """Linear exploration anneal (ppo_agent.py:160-169)."""
    cfg = _small_cfg("add_g1")
    cfg["agent"]["exp_prob"] = 1.0
    cfg["agent"]["exp_prob_end"] = 0.2
    cfg["agent"]["exp_anneal_samples"] = 1000.0
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    assert float(agent._exp_prob(jnp.asarray(0))) == 1.0
    assert abs(float(agent._exp_prob(jnp.asarray(500))) - 0.6) < 1e-6
    assert float(agent._exp_prob(jnp.asarray(10_000))) == pytest.approx(0.2)
    # constant when anneal samples is inf (reference default)
    cfg["agent"]["exp_anneal_samples"] = float("inf")
    agent2 = build_agent(cfg, env)
    assert agent2._exp_prob(jnp.asarray(10**9)) == 1.0


def test_mixed_precision_trains():
    """bf16 trunk path (AgentConfig.mixed_precision) trains finite and
    keeps the epoch-0 PPO ratio at 1 (consistent quantized policy)."""
    cfg = _small_cfg("add_g1")
    cfg["agent"]["mixed_precision"] = True
    agent, ts, info = _one_iter(cfg)
    assert agent.cfg.mixed_precision
    assert np.isfinite(info["loss"])
    assert abs(info["imp_ratio"] - 1.0) < 0.2


def test_disc_mixed_precision_trains():
    """bf16 disc trunk path (AgentConfig.disc_mixed_precision): finite
    losses and a finite, small grad penalty (the second-order path flows
    through the bf16 trunk)."""
    cfg = _small_cfg("add_g1")
    cfg["agent"]["mixed_precision"] = True
    cfg["agent"]["disc_mixed_precision"] = True
    agent, ts, info = _one_iter(cfg)
    assert agent.cfg.disc_mixed_precision
    assert np.isfinite(info["loss"])
    assert np.isfinite(info["disc_loss"])
    assert np.isfinite(info["disc_grad_penalty"])


def test_fused_adam_optimizer_trains():
    """agent.optimizer=fused_adam builds and trains one finite iteration
    (numerical parity vs the optax chain is pinned in test_learning)."""
    cfg = _small_cfg("add_g1")
    cfg["agent"]["optimizer"] = "fused_adam"
    agent, ts, info = _one_iter(cfg)
    assert np.isfinite(info["loss"])
    from add_gym_tpu.learning.optim import FusedAdamState

    assert isinstance(ts.opt_state, FusedAdamState)
    assert int(ts.opt_state.count) > 0
