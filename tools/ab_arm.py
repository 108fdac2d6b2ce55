"""One arm of the round-5 learning A/B: N train iterations -> metrics JSONL.

Usage: python tools/ab_arm.py out.jsonl [iters] [seed] [nudge]

``nudge`` overrides the motion-frame quantization nudge (default: leave
the shipped +0.25; pass 0.0 to revert to bare truncation) so its
learning-dynamics effect is isolated from the rest of round 5.
"""

import json
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


def main():
    out_path = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    nudge = float(sys.argv[4]) if len(sys.argv) > 4 else None

    if nudge is not None:
        from add_gym_tpu.motion import motion_lib as ml

        def patched(self, motion_ids, motion_times):
            meta = self.meta_all[motion_ids]
            length, wrap_f = meta[..., 0], meta[..., 1]
            max_frame = meta[..., 2]
            wrap = wrap_f != 0.0
            loops = jnp.floor(jnp.maximum(motion_times, 0.0) / length)
            t = jnp.where(wrap, motion_times - loops * length, motion_times)
            frame = jnp.clip(
                jnp.floor(t * self.dt_inv + nudge), 0.0, max_frame
            )
            idx = (frame + meta[..., 3]).astype(jnp.int32)
            offset = jnp.where(
                wrap[..., None], loops[..., None] * meta[..., 4:7], 0.0
            )
            return self.step_all[idx].at[..., 0:3].add(offset)

        ml.MotionLib.get_motion_rows = patched

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4096
    env = build_env(cfg)
    agent = build_agent(cfg, env, key=jax.random.PRNGKey(seed))

    ts = agent.init_train_state()
    es = env.init_state(4096)
    es = env.reset_where(
        jax.random.PRNGKey(seed), es, jnp.ones(4096, bool), ts.sampler
    )
    obs = env.compute_obs(es)

    keep = ("mean_ep_len", "mean_reward", "done_frac", "fail_frac", "loss")
    with open(out_path, "w") as f:
        for i in range(iters):
            ts, es, obs, info = agent.train_iter(
                ts, es, obs, jax.random.PRNGKey(seed * 1000003 + 1 + i)
            )
            if i % 10 == 0 or i == iters - 1:
                row = {"samples": int((i + 1) * 32 * 4096)}
                row.update(
                    {k: float(info[k]) for k in keep if k in info}
                )
                f.write(json.dumps(row) + "\n")
                f.flush()
    print("done", out_path, flush=True)


if __name__ == "__main__":
    main()
