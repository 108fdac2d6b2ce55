"""Device mesh + sharding helpers.

Replaces the reference's torchrun/NCCL DDP bootstrap (main.py:126-176,
sagemaker-entrypoint.sh — SURVEY.md §2.7) with a JAX device mesh: envs are
sharded along a 1-D ``env`` axis (physics is embarrassingly parallel across
envs), learner parameters are replicated, and every batch reduction
(gradients, normalizer stats, advantage moments) becomes a global XLA
collective under GSPMD — riding ICI within a slice.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def env_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-axis (env) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(mesh: Mesh, tree, axis: str = "env"):
    """Place every leaf with sharded leading env axis."""
    s = env_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def initialize_distributed():
    """Multi-host bootstrap (jax.distributed) — no-op on a single host.

    The reference's equivalent is torchrun c10d rendezvous + NCCL init
    (sagemaker-entrypoint.sh:103-140).  On TPU pods JAX picks up the
    coordinator from the environment automatically.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
