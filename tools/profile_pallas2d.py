"""Time the Pallas control-step kernel: 1-D vs sublane-tiled 2-D env layout.

Sync rule for the axon tunnel (memory notes round 2): chain the state
through k steps inside one jit and fetch a scalar at the end.

Usage: python tools/profile_pallas2d.py [num_envs] [steps_per_call]
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


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env
    from add_gym_tpu.physics.fused_step import FusedModelConstants
    from add_gym_tpu.physics.pallas_step import pallas_step

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    fc = env._fc if hasattr(env, "_fc") else FusedModelConstants(env.model)
    params = env.params

    es = env.init_state(N)
    sim = es.sim
    tgt = sim.dof_pos

    def chain(env2d):
        def body(s, _):
            s2, contact = pallas_step(fc, params, s, tgt, env2d=env2d)
            return s2, None

        def run(s):
            s, _ = jax.lax.scan(body, s, None, length=K)
            return s

        return jax.jit(run)

    for env2d in (False, True):
        fn = chain(env2d)
        t0 = time.perf_counter()
        out = fn(sim)
        np.asarray(jax.device_get(out.root_pos[0, 0]))
        c = time.perf_counter() - t0
        t0 = time.perf_counter()
        iters = 5
        s = sim
        for _ in range(iters):
            s = fn(s)
        np.asarray(jax.device_get(s.root_pos[0, 0]))
        dt = (time.perf_counter() - t0) / (iters * K)
        print(
            f"env2d={env2d}: compile {c:6.1f}s  "
            f"{dt * 1e3:7.3f} ms/control-step  "
            f"({N / dt / 1e6:.2f}M env-steps/s physics-only)",
            flush=True,
        )


if __name__ == "__main__":
    main()
