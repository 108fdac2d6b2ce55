"""Benchmark: full ADD+PPO training throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: aggregate env-steps/s through the complete training iteration
(rollout physics + obs/reward/done + discriminator reward + TD(lambda) +
5-epoch PPO/ADD update) at 4096 envs — the BASELINE.json north-star metric.
``vs_baseline`` is value / 1e6 (the >=1M env-steps/s target; the reference
publishes no numbers of its own, BASELINE.md).
"""

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
ITERS = int(os.environ.get("BENCH_ITERS", 5))


def main():
    import jax
    import jax.numpy as jnp

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    overrides = os.environ.get("BENCH_OVERRIDES", "").split()
    cfg = load_config("train", overrides)
    cfg["engine"]["num_envs"] = NUM_ENVS
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(NUM_ENVS)
    es = env.reset_where(
        jax.random.PRNGKey(0), es, jnp.ones(NUM_ENVS, bool), ts.sampler
    )
    obs = env.compute_obs(es)

    # warmup / compile: two iterations — the first compiles for fresh inputs,
    # the second compiles the steady-state signature (chained outputs carry
    # different layouts/avals than freshly-initialized arrays)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(info)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(99))
    jax.block_until_ready(info)

    t0 = time.time()
    for i in range(ITERS):
        ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(info)
    dt = time.time() - t0

    steps = ITERS * agent.cfg.steps_per_iter * NUM_ENVS
    env_steps_per_s = steps / dt

    print(
        json.dumps(
            {
                "metric": f"train env-steps/s @ {NUM_ENVS} envs (ADD+PPO, full iter)",
                "value": round(env_steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(env_steps_per_s / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
