"""Capture an on-device trace of update_model and aggregate op-level time.

Captures a jax.profiler trace around a few update_model invocations, then
parses the raw .xplane.pb directly (the tensorboard_plugin_profile
converter is broken against the installed TF) and prints device time by
HLO op category and the top individual ops.  This is the ground truth for
the ~60 ms of non-matmul update time (NEXT.md).

Usage: python tools/trace_update.py [num_envs] [phase]
  phase: update (default) | rollout | build | iter
"""

import glob
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def categorize(name: str) -> str:
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for key in ("convolution", "dot", "cumsum", "all-reduce", "all-gather",
                "reduce-scatter", "copy", "transpose", "reduce", "scatter",
                "gather", "sort", "rng", "select-and-scatter", "iota",
                "dynamic-slice", "dynamic-update-slice", "broadcast",
                "concatenate", "reshape", "convert", "slice", "pad",
                "bitcast", "while", "conditional", "custom-call",
                "infeed", "outfeed"):
        if key in n:
            return key
    return "other"


def aggregate_xplanes(logdir: str):
    """Sum per-op durations on device XLines from every .xplane.pb."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not files:
        print(f"no .xplane.pb under {logdir}")
        return
    by_op = defaultdict(float)
    by_cat = defaultdict(float)
    device_total = 0.0
    plane_names = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            plane_names.append(plane.name)
            # device planes: /device:TPU:0, /device:tpu... (skip host)
            pn = plane.name.lower()
            if "tpu" not in pn and "device" not in pn:
                continue
            if "host" in pn or "cpu" in pn:
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                ln = line.name.lower()
                # XLA op lines carry per-op events; step lines duplicate
                if "step" in ln:
                    continue
                for ev in line.events:
                    meta = emeta.get(ev.metadata_id)
                    name = meta.name if meta else str(ev.metadata_id)
                    dur = ev.duration_ps / 1e12
                    by_op[name] += dur
                    by_cat[categorize(name)] += dur
                    device_total += dur
    print("planes seen:", sorted(set(plane_names)))
    if not by_op:
        print("no device op events found (host-only trace?)")
        return
    print(f"\ndevice op time total: {device_total * 1e3:.2f} ms "
          f"(across all captured invocations)")
    print("\n-- by category --")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:>24s}: {t * 1e3:9.2f} ms  ({100 * t / device_total:5.1f}%)")
    print("\n-- top 30 ops --")
    for name, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{t * 1e3:9.2f} ms  {name[:110]}")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    phase = sys.argv[2] if len(sys.argv) > 2 else "update"

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    T = agent.cfg.steps_per_iter
    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(
        jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler
    )
    obs = env.compute_obs(es)
    key = jax.random.PRNGKey(1)

    roll = jax.jit(
        lambda ts, es, obs, k: agent.rollout(ts, es, obs, k, T, train=True)
    )
    es2, obs2, traj = roll(ts, es, obs, key)
    build = jax.jit(lambda ts, tr: agent.build_train_data(ts, tr))
    _, data, _ = build(ts, traj)

    if phase == "update":
        fn = jax.jit(lambda: agent.update_model(ts, data, key)[0].params)
    elif phase == "rollout":
        fn = jax.jit(lambda: roll(ts, es, obs, key)[2]["reward"])
    elif phase == "build":
        fn = jax.jit(lambda: build(ts, traj)[1]["adv"])
    else:
        fn = jax.jit(lambda: agent.train_iter(ts, es, obs, key)[3]["loss"])

    _sync(fn())  # compile
    _sync(fn())  # warm (chained-signature recompile rule)

    logdir = f"/tmp/trace_{phase}_{N}"
    os.system(f"rm -rf {logdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(3):
            out = fn()
        _sync(out)
    print(f"traced 3 invocations in {time.perf_counter() - t0:.2f} s "
          f"-> {logdir}", flush=True)
    aggregate_xplanes(logdir)


if __name__ == "__main__":
    main()
