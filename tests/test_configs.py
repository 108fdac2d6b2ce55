"""Every shipped top-level config composes and resolves.

The five BASELINE parity configs (BASELINE.json "configs") plus the
train/test/view entries must always load — a broken config group or a
renamed key fails here instead of at job-submission time.
"""

import pytest

from add_gym_tpu.utils.config import load_config

TOP_LEVEL = [
    "train", "test", "view",
    "parity_cpu4",   # BASELINE configs[0]: 4 envs CPU, single clip
    "ppo256",        # configs[1]: 256 envs single chip PPO
    "add4096",       # configs[2]: 4096 envs ADD+PPO multi-clip
    "multihost",     # configs[3]: env-sharded DP learner
    "dr_pod",        # configs[4]: domain-randomized pod scale
]


@pytest.mark.parametrize("name", TOP_LEVEL)
def test_config_composes(name):
    cfg = load_config(name)
    assert "task" in cfg
    if name == "view":  # kinematic playback: no engine/agent needed
        assert cfg["task"].get("motion_file")
        return
    assert "engine" in cfg
    assert int(cfg["engine"].get("num_envs", 0)) > 0
    assert "agent" in cfg
    # flagship agent group resolves its nets
    assert cfg["agent"].get("actor_net")


def test_overrides_apply():
    cfg = load_config("train", ["engine.num_envs=7", "agent.batch_size=2"])
    assert cfg["engine"]["num_envs"] == 7
    assert cfg["agent"]["batch_size"] == 2


def test_override_yaml11_booleans():
    """Dotted overrides parse YAML 1.1 booleans: ``engine.fused=off`` must
    be False, not bool("off") == True."""
    for word, want in (
        ("on", True), ("yes", True), ("True", True),
        ("off", False), ("no", False), ("false", False),
    ):
        cfg = load_config("train", [f"engine.fused={word}"])
        assert cfg["engine"]["fused"] is want, word


def test_pallas_override_strings():
    """CLI overrides arrive as strings: ``engine.pallas=off`` must disable
    the kernel (``bool("off")`` is True — the builder parses explicitly)."""
    from add_gym_tpu.builder import build_env

    base = ["engine.num_envs=4", "task.motion_file=" + _one_clip()]
    env = build_env(load_config("train", base + ["engine.pallas=off"]))
    assert not env.pallas
    with pytest.raises(ValueError, match="auto/on/off"):
        build_env(load_config("train", base + ["engine.pallas=nope"]))


def _one_clip():
    cfg = load_config("parity_cpu4")
    return cfg["task"]["motion_file"]


def test_dr_pod_has_randomization():
    cfg = load_config("dr_pod")
    dr = cfg["engine"].get("domain_rand", {})
    assert dr.get("enabled")
    # all four sim2real axes configured (incl. round-2 mass DR)
    assert "kp_scale_range" in dr and "friction_range" in dr
    assert "mass_range" in dr


@pytest.mark.slow
def test_dr_pod_smoke_trains():
    """One training iteration of the dr_pod composition at small scale:
    the whole stack (DR resample at reset, per-env params incl. mass
    scale, ADD update) runs. On the CPU test backend auto-pallas resolves
    to the fused path; on TPU the kernel takes DR params directly
    (tests/test_pallas_mini.py pins that parity)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from add_gym_tpu.builder import build_agent, build_env

    cfg = load_config("dr_pod")
    cfg["engine"]["num_envs"] = 8
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 2
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    env = build_env(cfg)
    assert env.fused and not env.pallas  # auto resolves off-TPU -> fused
    assert env.dr.mass_enabled
    agent = build_agent(cfg, env)
    ts = agent.init_train_state(jax.random.PRNGKey(0))
    es = env.init_state(8)
    es = env.reset_where(jax.random.PRNGKey(1), es, jnp.ones(8, bool), ts.sampler)
    m = np.asarray(es.dr["mass_scale"])
    assert m.std() > 0.01  # mass actually randomized
    obs = env.compute_obs(es)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(2))
    assert np.isfinite(float(info["loss"]))
