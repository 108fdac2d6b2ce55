"""Cumulative ablation of the rollout scan: where do 49 ms go?

Times scan variants of increasing fidelity (physics only -> + actor ->
+ motion gathers -> + obs assembly -> full rollout_step) with identical
carry structure, on the real device.  Sync rule for the axon tunnel:
fetch a scalar from the last output.

Usage: python tools/profile_rollout.py [num_envs]
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
    print(f"{name:>34s}: compile {c:6.1f} s   each {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    T = agent.cfg.steps_per_iter
    print(f"num_envs={N} T={T} obs={env.obs_dim()} disc={env.disc_obs_dim()}")

    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es,
                         jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)
    key = jax.random.PRNGKey(1)
    tgt0 = es.sim.dof_pos

    # A. physics only
    def roll_phys(es, tgt):
        def body(sim, _):
            sim2, contact = env._step_fn(env.params, sim, tgt)
            return sim2, jnp.sum(contact[:, 0])
        sim, outs = jax.lax.scan(body, es.sim, None, length=T)
        return outs
    timeit("A physics only", jax.jit(roll_phys), es, tgt0)

    # B. physics + actor forward (action feeds physics like the real loop).
    # NOTE: the output must depend on the FINAL carry or XLA DCEs the
    # physics entirely (first run of this tool measured actor-only here).
    def roll_phys_actor(es, obs, key):
        def body(carry, _):
            sim, obs, key = carry
            key, k_act = jax.random.split(key)
            action, _, a_logp, _ = agent._decide_action(
                ts.params, ts.obs_norm, k_act, obs, True, 1.0
            )
            sim2, contact = env._step_fn(env.params, sim, action)
            return (sim2, obs, key), jnp.sum(a_logp)
        (sim, _, _), outs = jax.lax.scan(
            body, (es.sim, obs, key), None, length=T)
        return outs, jnp.sum(sim.root_pos)
    timeit("B + actor fwd", jax.jit(roll_phys_actor), es, obs, key)

    # C. B + the two fused motion gathers (consumed trivially)
    H = env.task.num_disc_obs_steps
    K = len(env.tar_steps)
    dt_c = env.ctrl_dt

    def roll_gathers(es, obs, key):
        win_offs = -dt_c * jnp.arange(H - 1, -1, -1, dtype=jnp.float32)
        offs = jnp.concatenate(
            [win_offs, dt_c * jnp.asarray(env.tar_steps, jnp.float32)]
        )

        def body(carry, _):
            sim, obs, t, key = carry
            key, k_act = jax.random.split(key)
            action, _, a_logp, _ = agent._decide_action(
                ts.params, ts.obs_norm, k_act, obs, True, 1.0
            )
            sim2, contact = env._step_fn(env.params, sim, action)
            t2 = t + dt_c
            timesA = t2[:, None] + offs[None, :]
            idsA = jnp.broadcast_to(es.motion_ids[:, None], timesA.shape)
            rowsA = env.motion.get_motion_step(idsA, timesA)
            rowsB = env.motion.get_motion_step(idsA, timesA + 0.5)
            s = sum(jnp.sum(r) for r in rowsA) + sum(jnp.sum(r) for r in rowsB)
            return (sim2, obs, t2, key), s
        (sim, _, _, _), outs = jax.lax.scan(
            body, (es.sim, obs, es.time, key), None, length=T)
        return outs, jnp.sum(sim.root_pos)
    timeit("C + 2 motion gathers", jax.jit(roll_gathers), es, obs, key)

    # D. full rollout_step scan, consuming ONLY a_logp (XLA dead-codes the
    # unused traj outputs -> measures the compute without most of the
    # scan-output materialization)
    def roll_full(ts, es, obs, key):
        es, obs, traj = agent.rollout(ts, es, obs, key, T, train=True)
        return traj["a_logp"]
    timeit("D rollout (a_logp only)", jax.jit(roll_full), ts, es, obs, key)

    # D2. full rollout with the ENTIRE traj materialized (what train_iter
    # actually pays) — D2 - D = scan-output materialization cost
    def roll_full2(ts, es, obs, key):
        es, obs, traj = agent.rollout(ts, es, obs, key, T, train=True)
        return traj
    timeit("D2 rollout (full traj)", jax.jit(roll_full2), ts, es, obs, key)

    # E. rollout + build_train_data (phase pair, donation-free)
    def roll_build(ts, es, obs, key):
        k1, k2 = jax.random.split(key)
        es, obs, traj = agent.rollout(ts, es, obs, k1, T, train=True)
        ts2, data, info = agent.build_train_data(ts, traj, k2)
        return data["adv"]
    timeit("E rollout + build", jax.jit(roll_build), ts, es, obs, key)

    print("done")


if __name__ == "__main__":
    main()
