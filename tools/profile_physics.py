"""Micro-benchmark the fused physics control step on the current backend.

Usage: python tools/profile_physics.py [num_envs] [unroll]
"""

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
    unroll = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from add_gym_tpu.physics.model import build_physics_model
    from add_gym_tpu.physics.engine import EngineParams, default_state
    from add_gym_tpu.physics import fused_step as fs
    from add_gym_tpu.utils.assets import asset_path
    from tests.test_physics import reference_gains, standing_state

    model = build_physics_model(asset_path("g1_description/g1_29.xml"))
    fc = fs.FusedModelConstants(model)
    kp, kv = reference_gains(model, scale=3.0)
    params = EngineParams(kp=kp, kv=kv)
    s = standing_state(model, n=N)
    tgt = s.dof_pos

    from dataclasses import replace as drep

    def step_u(state, t):
        tgt2 = fs.apply_pd_target(fc.model, params, state, t)
        state = drep(state, pd_target=tgt2)
        dt = params.ctrl_dt / params.substeps

        def body(x, _):
            x, c = fs.fused_substep(fc, params, x, dt)
            return x, c

        state, cs = jax.lax.scan(body, state, None, length=params.substeps,
                                 unroll=unroll)
        return state, cs[-1]

    f = jax.jit(step_u)
    t0 = time.perf_counter()
    out = f(s, tgt)
    jax.block_until_ready(out)
    print(f"compile+1st: {time.perf_counter() - t0:.1f} s")
    # chain to steady-state signature
    s2, _ = out
    s2, c = f(s2, tgt)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    iters = 50
    for _ in range(iters):
        s2, c = f(s2, tgt)
    jax.block_until_ready(c)
    dt = (time.perf_counter() - t0) / iters
    print(f"unroll={unroll} N={N}: {dt * 1e3:.3f} ms/control-step "
          f"-> {N / dt / 1e6:.2f} M env-steps/s physics-only")


if __name__ == "__main__":
    main()
