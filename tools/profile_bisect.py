"""Bisect the train_iter slowdown: which phase composition is pathological."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>34s}: compile {c:6.1f} s   each {dt * 1e3:9.1f} ms")
    return out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    T = agent.cfg.steps_per_iter

    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)

    k = jax.random.PRNGKey(1)

    # A: rollout + build_train_data
    def ab(ts, es, obs, key):
        es, obs, traj = agent.rollout(ts, es, obs, key, T, train=True)
        ts, data, info = agent.build_train_data(ts, traj)
        return ts, data["adv"].sum(), info

    timeit("rollout+build", jax.jit(ab), ts, es, obs, k)

    # B: rollout + update on the rollout's own traj
    def rb(ts, es, obs, key):
        es, obs, traj = agent.rollout(ts, es, obs, key, T, train=True)
        ts2, data, _ = agent.build_train_data(ts, traj)
        ts3, info = agent.update_model(ts2, data, key)
        return ts3.params["params"]["actor_mean"]["bias"].sum(), info["loss"]

    timeit("rollout+build+update", jax.jit(rb), ts, es, obs, k)

    # C: rollout whose traj is detached (stop_gradient + identity) + update
    def rb2(ts, es, obs, key):
        es, obs, traj = agent.rollout(ts, es, obs, key, T, train=True)
        traj = jax.tree_util.tree_map(jax.lax.stop_gradient, traj)
        ts2, data, _ = agent.build_train_data(ts, traj)
        ts3, info = agent.update_model(ts2, data, key)
        return ts3.params["params"]["actor_mean"]["bias"].sum(), info["loss"]

    timeit("rollout+build+update(sg)", jax.jit(rb2), ts, es, obs, k)


if __name__ == "__main__":
    main()
