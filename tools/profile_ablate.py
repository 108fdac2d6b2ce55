"""Ablate train_iter tail sections to find the pathological op."""
import os, sys, time
from dataclasses import replace
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax, jax.numpy as jnp
from add_gym_tpu.learning import normalizer as norm
from add_gym_tpu.envs.done import DoneFlags

def timeit(name, fn, *args, iters=3):
    t0 = time.perf_counter(); out = fn(*args); jax.block_until_ready(out)
    c = time.perf_counter()-t0
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:>30s}: compile {c:6.1f}s  each {(time.perf_counter()-t0)/iters*1e3:9.1f} ms", flush=True)

N = 4096
from add_gym_tpu.utils.config import load_config
from add_gym_tpu.builder import build_env, build_agent
cfg = load_config("train"); cfg["engine"]["num_envs"] = N
env = build_env(cfg); agent = build_agent(cfg, env)
T = agent.cfg.steps_per_iter
ts = agent.init_train_state()
es = env.init_state(N)
es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
obs = env.compute_obs(es)
k = jax.random.PRNGKey(1)

def body(ts, es, obs, key, with_norm=True, with_info=True, ret_all=True):
    cfgA = agent.cfg
    k_roll, k_upd = jax.random.split(key)
    es, obs, traj = agent.rollout(ts, es, obs, k_roll, T, train=True)
    ts, data, data_info = agent.build_train_data(ts, traj)
    ts, train_info = agent.update_model(ts, data, k_upd)
    if with_norm:
        update_norm = ts.sample_count < cfgA.normalizer_samples
        new_obs_norm = norm.update_normalizer(ts.obs_norm, traj["obs"])
        obs_diff = traj["disc_obs_demo"] - traj["disc_obs"]
        new_disc_norm = norm.update_diff_normalizer(ts.disc_norm, obs_diff)
        ts = replace(ts,
            obs_norm=jax.tree_util.tree_map(lambda new, old: jnp.where(update_norm, new, old), new_obs_norm, ts.obs_norm),
            disc_norm=jax.tree_util.tree_map(lambda new, old: jnp.where(update_norm, new, old), new_disc_norm, ts.disc_norm),
            sample_count=ts.sample_count + cfgA.steps_per_iter * traj["reward"].shape[1])
    info = dict(train_info)
    if with_info:
        info.update(data_info)
        info["mean_reward"] = jnp.mean(data["reward"])
        info["mean_ep_len"] = 1.0 / jnp.maximum(jnp.mean((traj["done"] != 0).astype(jnp.float32)), 1e-6)
        info["done_frac"] = jnp.mean((traj["done"] != 0).astype(jnp.float32))
        info["fail_frac"] = jnp.mean((traj["done"] == int(DoneFlags.FAIL)).astype(jnp.float32))
    if ret_all:
        return ts, es, obs, info
    return info["loss"]

timeit("scalar-ret no-norm no-info", jax.jit(lambda a,b,c,d: body(a,b,c,d,False,False,False)), ts, es, obs, k)
timeit("scalar-ret +norm", jax.jit(lambda a,b,c,d: body(a,b,c,d,True,False,False)), ts, es, obs, k)
timeit("scalar-ret +norm+info", jax.jit(lambda a,b,c,d: body(a,b,c,d,True,True,False)), ts, es, obs, k)
timeit("full-ret no-norm no-info", jax.jit(lambda a,b,c,d: body(a,b,c,d,False,False,True)), ts, es, obs, k)
timeit("full-ret +norm+info (=train_iter)", jax.jit(lambda a,b,c,d: body(a,b,c,d,True,True,True)), ts, es, obs, k)
