"""Iter-0 eval + train probe (old-code arm of the round-5 attribution)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp_old"))
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import numpy as np, jax, jax.numpy as jnp
from add_gym_tpu.utils.config import load_config
from add_gym_tpu.builder import build_env, build_agent
from add_gym_tpu.learning.runner import episode_stats

n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
cfg = load_config("train"); cfg["engine"]["num_envs"] = n
env = build_env(cfg); agent = build_agent(cfg, env)
ts = agent.init_train_state(jax.random.PRNGKey(42))
es = env.init_state(n)
es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(n, bool), ts.sampler)
obs = env.compute_obs(es)
es2, obs2, r, d = agent.eval_rollout(ts, es, obs, 512, jax.random.PRNGKey(1))
r = np.asarray(jax.device_get(r)); d = np.asarray(jax.device_get(d))
rets, lens = episode_stats(r, d)
print(f"eval: mean_ep_len {np.mean(lens):7.2f} episodes {len(lens)} done_frac {(d!=0).mean():.4f}", flush=True)
ts3, es3, obs3, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(7))
info = {k: float(v) for k, v in jax.device_get(info).items()}
print(f"train iter0: ep_len {info['mean_ep_len']:7.2f} done_frac {info['done_frac']:.4f} fail {info['fail_frac']:.4f}", flush=True)
