"""add-gym-tpu: TPU-native humanoid motion-imitation RL.

A from-scratch JAX/XLA/Pallas re-design of the rsamf/add-gym capabilities:
batched articulated G1 physics, motion-imitation environment, PPO + ADD/AMP
learning, GSPMD multi-host scaling.  See README.md and STATUS.md.

Public entry points::

    from add_gym_tpu import load_config, build_env, build_agent, Trainer

Submodules are imported lazily so that light uses (the native data loader,
the config system) don't pull in jax/flax.
"""

__version__ = "0.1.0"

__all__ = [
    "build_agent",
    "build_env",
    "load_config",
    "Trainer",
    "__version__",
]


def __getattr__(name):
    if name in ("build_env", "build_agent"):
        from add_gym_tpu import builder

        return getattr(builder, name)
    if name == "load_config":
        from add_gym_tpu.utils.config import load_config

        return load_config
    if name == "Trainer":
        from add_gym_tpu.learning.runner import Trainer

        return Trainer
    raise AttributeError(f"module 'add_gym_tpu' has no attribute {name!r}")
