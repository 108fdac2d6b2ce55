"""Compare train_iter phase timings across rollout shapes on the device.

VERDICT r2 #8: steps_per_iter=128/batch_size=32 (the cloud
deploy/train-config.yaml shape) measured SLOWER end-to-end than the local
32/4 shape at equal samples/iter-normalized throughput.  Both shapes run
5 epochs x 8 minibatches of 16384 rows, so the update work is identical —
the difference must come from rollout length, buffer residency, or the
T*N=524288-row flat buffer.  This times rollout / build / update
separately at both shapes to localize it.

Sync rule for the axon tunnel: scalar device_get, not block_until_ready
(memory notes).

Usage: python tools/profile_shapes.py [num_envs]
"""

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>28s}: compile {c:6.1f} s   each {dt * 1e3:8.2f} ms",
          flush=True)
    return dt


def profile_shape(N, T, B):
    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    cfg["agent"] = dict(cfg["agent"], steps_per_iter=T, batch_size=B)
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(
        jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler
    )
    obs = env.compute_obs(es)
    key = jax.random.PRNGKey(1)
    print(f"--- shape T={T} B={B} N={N}: {T * N} rows/iter, "
          f"{agent.cfg.update_epochs} epochs x "
          f"{int(np.ceil(T / B))} minibatches "
          f"of {B * N} rows", flush=True)

    roll = jax.jit(
        lambda ts, es, obs, k: agent.rollout(ts, es, obs, k, T, train=True)
    )
    t_roll = timeit("rollout", roll, ts, es, obs, key)
    es2, obs2, traj = roll(ts, es, obs, key)

    build = jax.jit(lambda ts, tr: agent.build_train_data(ts, tr))
    t_build = timeit("build_train_data", build, ts, traj)
    _, data, _ = build(ts, traj)

    upd = jax.jit(lambda ts, d, k: agent.update_model(ts, d, k)[0].params)
    t_upd = timeit("update_model", upd, ts, data, key)

    full = jax.jit(
        lambda ts, es, obs, k: agent.train_iter(ts, es, obs, k)[3]["loss"]
    )
    t_full = timeit("full train_iter", full, ts, es, obs, key)
    sps = T * N / t_full
    print(f"  phases sum {1e3 * (t_roll + t_build + t_upd):.1f} ms; "
          f"full {1e3 * t_full:.1f} ms -> {sps / 1e3:.1f}K env-steps/s",
          flush=True)
    return sps


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    local = profile_shape(N, 32, 4)
    cloud = profile_shape(N, 128, 32)
    print(f"local 32/4: {local / 1e3:.1f}K  cloud 128/32: "
          f"{cloud / 1e3:.1f}K  ratio {cloud / local:.3f}", flush=True)


if __name__ == "__main__":
    main()
