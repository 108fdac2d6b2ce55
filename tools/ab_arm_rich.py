"""Bisect arm: new code but the RICH rollout path inside train_iter.

Replicates ADDAgent.train_iter with ``rollout`` (per-step RNG, raw
obs/action recording — the round-4 data flow) instead of
``rollout_lean``, on the current code base.  Distinguishes "the lean
rollout's RNG/recording changed learning" from "the env/aux/nudge
changes did" when compared against tools/ab_arm.py curves.

Usage: python tools/ab_arm_rich.py out.jsonl [iters] [seed]
"""

import json
import os
import sys
from dataclasses import replace
from functools import partial

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main():
    out_path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent
    from add_gym_tpu.learning import normalizer as norm

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4096
    env = build_env(cfg)
    agent = build_agent(cfg, env, key=jax.random.PRNGKey(seed))
    acfg = agent.cfg

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_iter_rich(ts, es, obs, key):
        k_roll, k_data, k_upd = jax.random.split(key, 3)
        es, obs, traj = agent.rollout(
            ts, es, obs, k_roll, acfg.steps_per_iter, train=True
        )
        ts, data, info = agent.build_train_data(ts, traj, k_data)
        ts, tinfo = agent.update_model(ts, data, k_upd)
        update_norm = ts.sample_count < acfg.normalizer_samples
        new_obs_norm = norm.update_normalizer(ts.obs_norm, traj["obs"])
        obs_diff = traj["disc_obs_demo"] - traj["disc_obs"]
        new_disc_norm = norm.update_diff_normalizer(ts.disc_norm, obs_diff)
        ts = replace(
            ts,
            obs_norm=jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_norm, new, old),
                new_obs_norm, ts.obs_norm,
            ),
            disc_norm=jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_norm, new, old),
                new_disc_norm, ts.disc_norm,
            ),
            sample_count=ts.sample_count
            + acfg.steps_per_iter * traj["reward"].shape[1],
        )
        done_mask = (traj["done"] != 0).astype(jnp.float32)
        n_done = jnp.sum(done_mask)
        out = dict(
            loss=tinfo["loss"],
            mean_ep_len=jnp.sum(traj["ep_time"] / env.ctrl_dt * done_mask)
            / jnp.maximum(n_done, 1.0),
            done_frac=jnp.mean(done_mask),
            fail_frac=jnp.mean((traj["done"] == 1).astype(jnp.float32)),
            mean_reward=jnp.mean(data["reward"]),
        )
        return ts, es, obs, out

    ts = agent.init_train_state()
    es = env.init_state(4096)
    es = env.reset_where(
        jax.random.PRNGKey(seed), es, jnp.ones(4096, bool), ts.sampler
    )
    obs = env.compute_obs(es)

    with open(out_path, "w") as f:
        for i in range(iters):
            ts, es, obs, info = train_iter_rich(
                ts, es, obs, jax.random.PRNGKey(seed * 1000003 + 1 + i)
            )
            if i % 10 == 0 or i == iters - 1:
                row = {"samples": int((i + 1) * 32 * 4096)}
                row.update({k: float(v) for k, v in info.items()})
                f.write(json.dumps(row) + "\n")
                f.flush()
    print("done", out_path, flush=True)


if __name__ == "__main__":
    main()
