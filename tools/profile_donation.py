"""Compare train_iter with and without buffer donation on the device."""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    def fresh():
        ts = agent.init_train_state()
        es = env.init_state(N)
        es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
        obs = env.compute_obs(es)
        return ts, es, obs

    raw = agent.train_iter.__wrapped__  # undecorated method

    for name, jitted in [
        ("no-donate", jax.jit(raw, static_argnums=0)),
        ("donate", jax.jit(raw, static_argnums=0, donate_argnums=(1, 2))),
    ]:
        ts, es, obs = fresh()
        t0 = time.perf_counter()
        ts, es, obs, info = jitted(agent, ts, es, obs, jax.random.PRNGKey(1))
        jax.block_until_ready(info)
        print(f"{name}: compile+1st {time.perf_counter() - t0:.1f} s")
        t0 = time.perf_counter()
        iters = 3
        for i in range(iters):
            ts, es, obs, info = jitted(agent, ts, es, obs, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(info)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: each {dt * 1e3:.1f} ms -> {32 * N / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
