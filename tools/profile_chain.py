"""Chained train_iter calls (output -> next input): the bench pattern."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax, jax.numpy as jnp

N = 4096
from add_gym_tpu.utils.config import load_config
from add_gym_tpu.builder import build_env, build_agent
cfg = load_config("train"); cfg["engine"]["num_envs"] = N
env = build_env(cfg); agent = build_agent(cfg, env)
ts = agent.init_train_state()
es = env.init_state(N)
es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
obs = env.compute_obs(es)

raw = agent.train_iter.__wrapped__
jitted = jax.jit(raw, static_argnums=0)

t0 = time.perf_counter()
ts1, es1, obs1, info = jitted(agent, ts, es, obs, jax.random.PRNGKey(1))
jax.block_until_ready(info)
print(f"compile+1st: {time.perf_counter()-t0:.1f} s", flush=True)

# non-chained: same fresh inputs every time
t0 = time.perf_counter()
for i in range(3):
    out = jitted(agent, ts, es, obs, jax.random.PRNGKey(2))
jax.block_until_ready(out)
print(f"non-chained each: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

# chained
ts2, es2, obs2 = ts1, es1, obs1
t0 = time.perf_counter()
for i in range(3):
    t1 = time.perf_counter()
    ts2, es2, obs2, info = jitted(agent, ts2, es2, obs2, jax.random.PRNGKey(3+i))
    jax.block_until_ready(info)
    print(f"  chained call {i}: {time.perf_counter()-t1:.2f} s", flush=True)
print(f"chained each: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)
