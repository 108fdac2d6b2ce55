"""Benchmark: full ADD+PPO training throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Metric: aggregate env-steps/s through the complete training iteration
(rollout physics + obs/reward/done + discriminator reward + TD(lambda) +
5-epoch PPO/ADD update) at 4096 envs — the BASELINE.json north-star metric.
``vs_baseline`` is value / 1e6 (the >=1M env-steps/s target; the reference
publishes no numbers of its own, BASELINE.md).

Extra fields (round 5):

* ``floor_ratio`` — value / derived hardware ceiling for this chip.  The
  ceiling counts the iteration's matmul FLOPs from the actual parameter
  shapes (update fwd/bwd incl. the grad-penalty double backward, rollout
  actor, data-build critic/disc passes) against the chip's bf16 peak,
  plus the measured Pallas physics-kernel floor.  Full derivation:
  docs/SCALING.md.  A floor_ratio near 1.0 means the run is
  hardware-bound on this chip, not software-bound.
* steady-state timing: after the two compile iterations, one discarded
  ramp window runs before the timed windows, and the reported value is
  the MEDIAN of three 5-iteration windows — insensitive to cold compile
  caches and first-invocation device state (the round-4 driver-vs-builder
  3% gap).

Env knobs: BENCH_NUM_ENVS, BENCH_ITERS (window length), BENCH_WINDOWS,
BENCH_STEPS_PER_ITER (e.g. 128 for the reference's cloud operating point,
deploy/train-config.yaml:29 — secondary figure, docs/BENCH_NOTES.md),
BENCH_OVERRIDES (extra config overrides).
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
ITERS = int(os.environ.get("BENCH_ITERS", 5))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", 3))
STEPS_OVERRIDE = os.environ.get("BENCH_STEPS_PER_ITER")

# bf16 matmul peak FLOP/s by chip (public specs; docs/SCALING.md)
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,        # v5p
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e (Trillium)
}
# measured Pallas megakernel cost per control step at 4096 envs on v5e
# (4 substeps + held self-collision; .runs/profile_rollout_r5.log) — the
# physics floor is empirical, not FLOP-derived (the kernel is VPU/serial-
# sweep bound, not MXU bound)
_PHYS_MS_PER_STEP = 0.33


def _mm_params(tree):
    """Sum of in*out over kernel leaves (matmul cost per sample = 2x)."""
    import numpy as np

    total = 0
    for path, leaf in _iter_leaves(tree):
        if path[-1] == "kernel":
            shape = np.shape(leaf)
            if len(shape) == 2:
                total += shape[0] * shape[1]
    return total


def _iter_leaves(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_leaves(v, path + (k,))
    else:
        yield path, tree


def derived_ceiling(agent, num_envs, device_kind, phys_ms_per_step=None):
    """Hardware-ceiling env-steps/s for one full train_iter on this chip.

    Counts matmul FLOPs from the live parameter tree (docs/SCALING.md):

    * update: epochs x M x [6(Pa+Pc) + 12 Pd]  (fwd 2P + bwd 4P per
      trunk; disc counted twice for the grad-penalty double backward)
    * rollout: T x N x 2 Pa actor forward x2 for the stacked double obs
      pass... actor acts once per step: 2 Pa; critic not in rollout
    * build: M x (2 passes x 2 Pc critic fwd + 2 Pd disc-reward fwd)
    * physics: T x measured kernel ms (empirical floor)
    """
    cfg = agent.cfg
    p = agent.net_params_by_trunk()
    Pa, Pc, Pd = p["actor"], p["critic"], p["disc"]
    T = cfg.steps_per_iter
    M = T * num_envs
    peak = _PEAK_BF16.get(device_kind, 197e12)

    update_flops = cfg.update_epochs * M * (6 * (Pa + Pc) + 12 * Pd)
    rollout_flops = M * 2 * Pa
    build_flops = M * (2 * 2 * Pc + 2 * Pd)
    mm_s = (update_flops + rollout_flops + build_flops) / peak
    phys = phys_ms_per_step if phys_ms_per_step is not None else _PHYS_MS_PER_STEP
    phys_s = T * phys * 1e-3
    floor_s = mm_s + phys_s
    return M / floor_s, floor_s


def main():
    import jax
    import jax.numpy as jnp

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    overrides = os.environ.get("BENCH_OVERRIDES", "").split()
    cfg = load_config("train", overrides)
    cfg["engine"]["num_envs"] = NUM_ENVS
    if STEPS_OVERRIDE:
        cfg["agent"]["steps_per_iter"] = int(STEPS_OVERRIDE)
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(NUM_ENVS)
    es = env.reset_where(
        jax.random.PRNGKey(0), es, jnp.ones(NUM_ENVS, bool), ts.sampler
    )
    obs = env.compute_obs(es)

    # warmup / compile: two iterations — the first compiles for fresh inputs,
    # the second compiles the steady-state signature (chained outputs carry
    # different layouts/avals than freshly-initialized arrays)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(1))
    jax.block_until_ready(info)
    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(99))
    jax.block_until_ready(info)

    steps_per_window = ITERS * agent.cfg.steps_per_iter * NUM_ENVS
    key_i = 2

    def window():
        nonlocal ts, es, obs, key_i
        t0 = time.time()
        for _ in range(ITERS):
            ts, es, obs, info = agent.train_iter(
                ts, es, obs, jax.random.PRNGKey(key_i)
            )
            key_i += 1
        jax.block_until_ready(info)
        return steps_per_window / (time.time() - t0)

    window()  # ramp window (discarded): device state / dispatch warm-up
    rates = [window() for _ in range(WINDOWS)]
    env_steps_per_s = statistics.median(rates)

    kind = jax.devices()[0].device_kind
    ceiling, floor_s = derived_ceiling(agent, NUM_ENVS, kind)

    out = {
        "metric": f"train env-steps/s @ {NUM_ENVS} envs (ADD+PPO, full iter)",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / 1e6, 4),
        "floor_ratio": round(env_steps_per_s / ceiling, 4),
        "derived_ceiling": round(ceiling, 1),
        "device_kind": kind,
        "windows": [round(r, 1) for r in rates],
    }
    if STEPS_OVERRIDE:
        out["metric"] += f" [steps_per_iter={STEPS_OVERRIDE}]"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
