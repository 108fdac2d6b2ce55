"""Isolate the effect of the frame-quantization nudge on episode length.

Round 5 changed motion-frame quantization from bare truncation to
truncation + 0.25-frame nudge (motion_lib.get_motion_rows).  The flagship
run then showed untrained-policy episodes lasting ~15% longer than round
4 at identical weights/keys.  This probe runs the SAME untrained greedy
eval twice — stock code vs get_motion_rows monkeypatched back to the
bare-truncation quantization — so the nudge's contribution is measured
in isolation from every other round-5 change.

Usage: python tools/probe_frame_nudge.py [num_envs] [steps]
"""

import os
import sys

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp


def run_eval(nudge: float, num_envs: int, steps: int):
    from add_gym_tpu.motion import motion_lib as ml
    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent
    from add_gym_tpu.learning.runner import episode_stats

    orig = ml.MotionLib.get_motion_rows

    def patched(self, motion_ids, motion_times):
        meta = self.meta_all[motion_ids]
        length, wrap_f = meta[..., 0], meta[..., 1]
        max_frame = meta[..., 2]
        wrap = wrap_f != 0.0
        loops = jnp.floor(jnp.maximum(motion_times, 0.0) / length)
        t = jnp.where(wrap, motion_times - loops * length, motion_times)
        frame = jnp.floor(t * self.dt_inv + nudge)
        frame = jnp.clip(frame, 0.0, max_frame)
        idx = (frame + meta[..., 3]).astype(jnp.int32)
        offset = jnp.where(
            wrap[..., None], loops[..., None] * meta[..., 4:7], 0.0
        )
        row = self.step_all[idx]
        return row.at[..., 0:3].add(offset)

    ml.MotionLib.get_motion_rows = patched
    try:
        cfg = load_config("train")
        cfg["engine"]["num_envs"] = num_envs
        env = build_env(cfg)
        agent = build_agent(cfg, env)
        ts = agent.init_train_state(jax.random.PRNGKey(42))
        es = env.init_state(num_envs)
        es = env.reset_where(
            jax.random.PRNGKey(0), es, jnp.ones(num_envs, bool), ts.sampler
        )
        obs = env.compute_obs(es)
        es, obs, r, d = agent.eval_rollout(
            ts, es, obs, steps, jax.random.PRNGKey(1)
        )
        r = np.asarray(jax.device_get(r))
        d = np.asarray(jax.device_get(d))
        rets, lens = episode_stats(r, d)
        fail = float((d != 0).mean())
        return np.mean(lens), len(lens), fail
    finally:
        ml.MotionLib.get_motion_rows = orig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    for nudge in (0.25, 0.0):
        ep, cnt, df = run_eval(nudge, n, steps)
        print(
            f"nudge={nudge:4.2f}: mean_ep_len {ep:7.2f}  episodes {cnt}"
            f"  done_frac {df:.4f}", flush=True,
        )


if __name__ == "__main__":
    main()
