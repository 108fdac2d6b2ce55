"""Break one train_iter into jitted phases and time each on the device.

Usage: python tools/profile_train_iter.py [num_envs]
"""

import os
import sys
import time
from functools import partial

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    print(f"{name:>40s} compile+1st: {time.perf_counter() - t0:8.2f} s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>40s}        each: {dt * 1e3:9.1f} ms")
    return out, dt


def main():
    N = int(os.environ.get("BENCH_NUM_ENVS", sys.argv[1] if len(sys.argv) > 1 else 4096))

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)
    T = agent.cfg.steps_per_iter
    print(f"num_envs={N} steps_per_iter={T}")

    # phase 1: rollout only
    roll = jax.jit(
        lambda ts, es, obs, key: agent.rollout(ts, es, obs, key, T, train=True)
    )
    (es2, obs2, traj), t_roll = timeit(
        "rollout x32", roll, ts, es, obs, jax.random.PRNGKey(1)
    )

    # phase 2: build train data
    btd = jax.jit(lambda ts, traj: agent.build_train_data(ts, traj))
    (ts2, data, _), t_btd = timeit("build_train_data", btd, ts, traj)

    # phase 3: update
    upd = jax.jit(lambda ts, data, key: agent.update_model(ts, data, key))
    _, t_upd = timeit("update_model", upd, ts2, data, jax.random.PRNGKey(2))

    # full train_iter for comparison.  train_iter donates (ts, env_state),
    # so rebind outputs every call and time the steady state (2 warmups:
    # chained outputs carry a different signature than fresh arrays).
    ts2, es2, obs2 = ts, es, obs
    for k in (3, 4):
        ts2, es2, obs2, info = agent.train_iter(ts2, es2, obs2, jax.random.PRNGKey(k))
    jax.block_until_ready(info)
    t0 = time.perf_counter()
    iters = 3
    for k in range(iters):
        ts2, es2, obs2, info = agent.train_iter(ts2, es2, obs2, jax.random.PRNGKey(5 + k))
    jax.block_until_ready(info)
    t_full = (time.perf_counter() - t0) / iters

    print(f"\nsum of phases: {(t_roll + t_btd + t_upd) * 1e3:.1f} ms; "
          f"full: {t_full * 1e3:.1f} ms")
    print(f"env-steps/s (full): {T * N / t_full:,.0f}")


if __name__ == "__main__":
    main()
