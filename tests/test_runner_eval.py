"""Trainer.evaluate episode accounting.

The reference's ``test_model`` resets all envs at entry and only counts
whole episodes (base_agent.py:393-425).  These tests pin that our eval
statistics are invariant to the training state the eval interrupts.
"""

import jax
import pytest

from add_gym_tpu.learning.runner import Trainer
from add_gym_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["task"]["max_episode_length"] = 0.5  # 50 steps at 100 Hz
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["test_episodes"] = 0
    cfg["log_dir"] = str(tmp_path_factory.mktemp("logs"))
    cfg["experiment_name"] = "eval_test"
    return Trainer(cfg, use_mesh=False)


def test_evaluate_invariant_to_training_state(trainer):
    t = trainer
    key0 = t._key
    es0, obs0 = t.es, t.obs

    stats1 = t.evaluate(4)
    assert stats1["num_eps"] >= 4

    # scramble the training env state: advance it by a partial rollout so
    # episodes are mid-flight when evaluate() interrupts
    es, obs, _, _ = t.agent.eval_rollout(
        t.ts, es0, obs0, 7, jax.random.PRNGKey(1234)
    )
    t.es, t.obs = es, obs
    t._key = key0  # same eval RNG stream

    stats2 = t.evaluate(4)
    # reset-at-entry makes the statistics independent of the interrupted
    # training state (same policy, same keys -> identical episodes)
    assert stats1 == stats2


def test_evaluate_counts_whole_episodes_only(trainer):
    t = trainer
    stats = t.evaluate(4)
    max_ep_steps = int(
        t.env.task.max_episode_length / t.env.ctrl_dt
    )
    # every counted episode starts at the entry reset, so no length can
    # exceed the cap and the mean is well-defined
    assert 0 < stats["mean_ep_len"] <= max_ep_steps
    assert stats["num_eps"] >= 4


def test_eval_isolated_restores_training_state(tmp_path_factory):
    """eval_isolated=true: evaluate() returns statistics but leaves the
    training env state bitwise untouched (the round-5 protocol study
    showed the reference's carry-over semantics costs sample efficiency
    under heavy eval — docs/TRAINING.md)."""
    import numpy as np
    import jax.numpy as jnp
    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.learning.runner import Trainer

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["task"]["max_episode_length"] = 0.5
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    cfg["test_episodes"] = 0
    cfg["eval_isolated"] = True
    cfg["log_dir"] = str(tmp_path_factory.mktemp("logs"))
    cfg["experiment_name"] = "iso"
    t = Trainer(cfg, use_mesh=False)

    es0 = jax.device_get(t.es)
    obs0 = np.asarray(jax.device_get(t.obs))
    info = t.evaluate(4)
    assert info["num_eps"] >= 1
    es1 = jax.device_get(t.es)
    obs1 = np.asarray(jax.device_get(t.obs))
    np.testing.assert_array_equal(obs0, obs1)
    for a, b in zip(
        jax.tree_util.tree_leaves(es0), jax.tree_util.tree_leaves(es1)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
