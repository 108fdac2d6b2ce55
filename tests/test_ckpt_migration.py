"""Checkpoint opt_state migration across optimizer configs.

The "adam" optax chain and "fused_adam" (learning/optim.py) carry the same
adam moments in different opt_state tree shapes.  Trainer.load must restore
a checkpoint saved under either config when running under the other (spot
auto-resume after the round-4 default switch to fused_adam, or resume_path
of an older flagship checkpoint) — ADVICE r4 item 1.
"""

import numpy as np
import jax
import pytest

from add_gym_tpu.learning.optim import (
    extract_adam_moments,
    fused_clip_adam,
    inject_adam_moments,
)
from add_gym_tpu.learning.runner import Trainer
from add_gym_tpu.utils.config import load_config


def _cfg(tmp_path, optimizer):
    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["agent"]["optimizer"] = optimizer
    cfg["test_episodes"] = 0
    cfg["log_dir"] = str(tmp_path)
    cfg["experiment_name"] = "mig"
    return cfg


def test_moment_roundtrip_unit():
    import optax

    params = {"w": jax.numpy.ones((3, 2)), "b": jax.numpy.zeros((2,))}
    chain = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4, weight_decay=0.0))
    fused = fused_clip_adam(1e-4, clip=1.0)

    s_chain = chain.init(params)
    grads = jax.tree_util.tree_map(lambda x: x + 0.5, params)
    _, s_chain = chain.update(grads, s_chain, params)

    c, mu, nu = extract_adam_moments(s_chain)
    s_fused = inject_adam_moments(fused.init(params), c, mu, nu)
    assert int(s_fused.count) == int(c)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_fused.mu), jax.tree_util.tree_leaves(mu)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and back: fused -> chain
    s_chain2 = inject_adam_moments(chain.init(params), *extract_adam_moments(s_fused))
    c2, mu2, _ = extract_adam_moments(s_chain2)
    assert int(c2) == int(c)
    for a, b in zip(
        jax.tree_util.tree_leaves(mu2), jax.tree_util.tree_leaves(mu)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # sgd state has no moments -> clear error
    sgd = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1e-4, momentum=0.9))
    with pytest.raises(ValueError, match="adam moments"):
        extract_adam_moments(sgd.init(params))


@pytest.mark.parametrize("save_opt,load_opt", [
    ("adam", "fused_adam"),
    ("fused_adam", "adam"),
])
def test_trainer_load_migrates(tmp_path, save_opt, load_opt):
    t1 = Trainer(_cfg(tmp_path, save_opt), use_mesh=False)
    k = t1._next_key()
    t1.ts, t1.es, t1.obs, _ = t1.agent.train_iter(t1.ts, t1.es, t1.obs, k)
    t1.iter = 1
    t1.save()
    saved = jax.device_get(t1.ts)

    # same experiment dir -> auto-resume path finds the checkpoint and must
    # migrate the opt_state shape
    t2 = Trainer(_cfg(tmp_path, load_opt), use_mesh=False)
    assert t2.iter == 1
    restored = jax.device_get(t2.ts)

    for a, b in zip(
        jax.tree_util.tree_leaves(saved.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c1, mu1, nu1 = extract_adam_moments(saved.opt_state)
    c2, mu2, nu2 = extract_adam_moments(restored.opt_state)
    assert int(c1) == int(c2)
    for a, b in zip(jax.tree_util.tree_leaves(mu1), jax.tree_util.tree_leaves(mu2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(nu1), jax.tree_util.tree_leaves(nu2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and training continues from the migrated state
    k = t2._next_key()
    t2.ts, t2.es, t2.obs, info = t2.agent.train_iter(t2.ts, t2.es, t2.obs, k)
    assert np.isfinite(float(info["loss"]))
