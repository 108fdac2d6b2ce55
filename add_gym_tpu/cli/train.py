"""Training / evaluation CLI.

Equivalent of the reference's ``add_gym/main.py`` hydra entry: composes
config groups, supports dotted overrides, dispatches mode=train|test, and
auto-resumes from the experiment checkpoint for spot restarts.

Usage:
    python -m add_gym_tpu.cli.train engine.num_envs=4096 experiment_name=run1
    python -m add_gym_tpu.cli.train mode=test checkpoint=logs/run1/checkpoint
    python -m add_gym_tpu.cli.train add4096 engine.num_envs=8192   # named config
"""

from __future__ import annotations

import json
import os
import sys

# persistent XLA compilation cache: repeat runs of the same config skip the
# (minutes-long on shared TPU frontends) executable build
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    overrides = [a for a in argv if "=" in a]
    # a bare argument names the top-level config (configs/<name>.yaml)
    names = [a for a in argv if "=" not in a]
    config_name = names[0] if names else "train"

    from add_gym_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.learning.runner import Trainer

    cfg = load_config(config_name, overrides)
    mode = cfg.get("mode", "train")

    # Debug / sanitizer analog (SURVEY.md §5.2 — the reference has only
    # operational workarounds; JAX's functional purity removes most of that
    # class, and these flags cover the rest):
    #   debug.nans=true          — jax_debug_nans: every jitted op checks
    #                              for NaNs and re-runs un-jitted to point
    #                              at the producing primitive
    #   debug.parity_check=true  — step the fused TPU path and the readable
    #                              reference-layout engine side by side at
    #                              startup and assert they agree before any
    #                              training happens
    dbg = cfg.get("debug", {}) or {}
    import jax

    if dbg.get("nans"):
        jax.config.update("jax_debug_nans", True)

    trainer = Trainer(cfg)

    if dbg.get("parity_check"):
        from add_gym_tpu.utils.debug import parity_check

        parity_check(trainer.env)

    # persist the composed config for reproducibility (ref main.py:62-66,
    # pickled there; JSON here for inspectability)
    import jax

    if jax.process_index() == 0:
        os.makedirs(trainer.exp_dir, exist_ok=True)
        with open(os.path.join(trainer.exp_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    if mode == "train":
        max_iters = cfg.get("max_iters")
        trainer.train(max_iters=int(max_iters) if max_iters else None)
    elif mode == "test":
        ckpt = cfg.get("checkpoint")
        if ckpt:
            from add_gym_tpu.utils.remote import fetch_dir

            trainer.load(fetch_dir(str(ckpt)))
        info = trainer.evaluate(int(cfg.get("test_episodes", 10)))
        print(json.dumps(info))
    else:
        raise ValueError(f"Unsupported mode: {mode}")


if __name__ == "__main__":
    main()
