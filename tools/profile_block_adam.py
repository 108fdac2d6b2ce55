"""A/B the minibatch shuffle block size (32 vs 8) x optimizer (adam chain
vs fused_clip_adam) on the full update_model, real device, identical data.

The round-4 snapshot switched the shuffle block 8 -> 32 on the isolated
gather measurement (tools/profile_gathers.py: 9.7 -> 8.0 ms); this times
the choice inside the REAL update (where gathers overlap with matmuls and
the block size changes the gather/compute interleave).

Usage: python tools/profile_block_adam.py [num_envs]
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>28s}: compile {c:6.1f} s   each {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent
    from add_gym_tpu.learning import add_agent as agent_mod

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    acfg = agent.cfg
    T = acfg.steps_per_iter
    print(f"num_envs={N} T={T} epochs={acfg.update_epochs} "
          f"mb={acfg.batch_size * N}")

    ts = agent.init_train_state()
    obs_dim, disc_dim, nd = env.obs_dim(), env.disc_obs_dim(), env.num_dofs
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    f32 = jnp.float32
    data = dict(
        reward=jax.random.normal(ks[0], (T, N), f32),
        norm_obs=jax.random.normal(ks[1], (T, N, obs_dim), f32),
        norm_a=jax.random.normal(ks[2], (T, N, nd), f32),
        a_logp=jax.random.normal(ks[3], (T, N), f32),
        tar_val=jax.random.normal(ks[4], (T, N), f32),
        adv=jax.random.normal(ks[5], (T, N), f32),
        rand_mask=jnp.ones((T, N), f32),
        disc_in=jax.random.normal(ks[6], (T, N, disc_dim), f32),
    )
    if acfg.mixed_precision:
        data["norm_obs"] = data["norm_obs"].astype(jnp.bfloat16)
    k_upd = jax.random.PRNGKey(7)

    orig_pick = agent_mod.pick_shuffle_block

    def force_block(B):
        # the forced block must satisfy the same validity conditions the
        # real gate checks (pick_shuffle_block): blocks tile minibatches
        # exactly and are 'B adjacent envs at one timestep' — otherwise the
        # sweep times a correlated (invalid) shuffle
        mb_size = (T * N) // int(np.ceil(T / acfg.batch_size))
        assert mb_size % B == 0 and N % B == 0, (
            f"block {B} invalid for mb_size={mb_size} N={N}"
        )
        agent_mod.pick_shuffle_block = lambda *a: B

    from dataclasses import replace as dc_replace

    try:
        for opt_name in ("adam", "fused_adam"):
            cfg_o = dict(cfg)
            cfg_o["agent"] = dict(cfg["agent"], optimizer=opt_name)
            ag = build_agent(cfg_o, env)
            ts_o = dc_replace(ts, opt_state=ag.optimizer.init(ts.params))
            for B in (32, 8, 1):
                force_block(B)
                upd = jax.jit(lambda t, d, k: ag.update_model(t, d, k)[0].params)
                timeit(f"{opt_name} B={B}", upd, ts_o, data, k_upd)
    finally:
        # restore even on mid-sweep failure (OOM at one shape would
        # otherwise leave the module global patched for the whole process)
        agent_mod.pick_shuffle_block = orig_pick
    print("done")


if __name__ == "__main__":
    main()
