"""Per-component wall-clock profiling on the current JAX backend.

Times the pieces of one training iteration independently:
  - physics control step (reference-layout engine.step)
  - physics control step (SoA fused_step)
  - full env.step (physics + motion gather + obs/reward/done)
  - policy forward (actor MLP)
  - full train_iter minus rollout (update only, approximated)

Usage: python tools/profile_components.py [num_envs]
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>44s}: {dt * 1e3:9.3f} ms")
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent
    from add_gym_tpu.physics import engine as eng
    from add_gym_tpu.physics.fused_step import FusedModelConstants, fused_step

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)
    print(f"num_envs={N} obs_dim={obs.shape[-1]} backend={jax.devices()[0]}")

    tgt = es.sim.dof_pos

    # 1. physics: reference layout
    step_ref = jax.jit(lambda s, t: eng.step(env.model, env.params, s, t))
    t_ref = timeit("engine.step (ref layout)", step_ref, es.sim, tgt)

    # 2. physics: fused SoA
    fc = FusedModelConstants(env.model)
    step_soa = jax.jit(lambda s, t: fused_step(fc, env.params, s, t))
    t_soa = timeit("fused_step (SoA)", step_soa, es.sim, tgt)

    # 3. full env.step
    env_step = jax.jit(lambda s, t: env.step(s, t))
    timeit("env.step (physics+obs+reward+done)", env_step, es, tgt)

    # 4. policy forward
    from add_gym_tpu.learning.networks import ADDNet

    actor = jax.jit(
        lambda p, o: agent.net.apply(p, o, method=ADDNet.actor)
    )
    timeit("actor MLP fwd", actor, ts.params, obs)

    # 5. reset_where
    reset = jax.jit(
        lambda k, s: env.reset_where(k, s, jnp.ones(N, bool), ts.sampler)
    )
    timeit("reset_where (full)", reset, jax.random.PRNGKey(1), es)

    # 6. one full rollout step (decide+env.step+reset+obs)
    def roll1(ts_, es_, obs_, key):
        es2, obs2, traj = agent.rollout(ts_, es_, obs_, key, 1)
        return obs2

    roll1j = jax.jit(roll1)
    timeit("rollout 1 step (full hot loop body)", roll1j, ts, es, obs, jax.random.PRNGKey(2))

    # 7. update only: build_train_data + update_model on a fake traj
    T = agent.cfg.steps_per_iter

    def mk_traj(key):
        ks = jax.random.split(key, 8)
        D = env.num_dofs
        od = obs.shape[-1]
        dd = env.disc_obs_dim()
        z = lambda k, *s: jax.random.normal(k, (T, N) + s) * 0.01
        return dict(
            obs=z(ks[0], od), next_obs=z(ks[1], od),
            action=z(ks[2], D), a_logp=z(ks[3])[..., ],
            rand_mask=jnp.ones((T, N)), reward=z(ks[4]),
            done=jnp.zeros((T, N), jnp.int32),
            disc_obs=z(ks[5], dd), disc_obs_demo=z(ks[6], dd),
            motion_ids=jnp.zeros((T, N), jnp.int32),
            motion_times=jnp.abs(z(ks[7])),
        )

    traj = mk_traj(jax.random.PRNGKey(3))

    def upd(ts_, traj_, key):
        ts2, data, _ = agent.build_train_data(ts_, traj_)
        ts3, info = agent.update_model(ts2, data, key)
        return info["loss"]

    updj = jax.jit(upd)
    t_upd = timeit("build_train_data + update_model", updj, ts, traj, jax.random.PRNGKey(4), iters=3)

    # summary
    t_iter_est = t_upd + T * 0  # rollout measured separately
    print(f"\nper-iter update cost: {t_upd:.3f} s "
          f"-> update-only ceiling {T * N / t_upd / 1e6:.3f} M env-steps/s")
    print(f"physics speedup SoA vs ref: {t_ref / t_soa:.2f}x")


if __name__ == "__main__":
    main()
