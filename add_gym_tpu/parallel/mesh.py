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


def _spans_other_processes(mesh: Mesh) -> bool:
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def put_with_sharding(x, s: NamedSharding):
    """device_put that also works on meshes spanning other processes.

    Multi-process (pod) meshes include non-addressable devices, which
    plain ``jax.device_put`` rejects; build the global array from this
    process's local shards instead (each process contributes the slices
    its devices own, taken from its full-size local value).
    """
    if not _spans_other_processes(s.mesh):
        return jax.device_put(x, s)
    xh = np.asarray(x)
    return jax.make_array_from_callback(
        xh.shape, s, lambda idx: np.asarray(xh[idx])
    )


def shard_env_tree(mesh: Mesh, tree, axis: str = "env"):
    """Place every leaf with sharded leading env axis."""
    s = env_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: put_with_sharding(x, s), tree)


def replicate_tree(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: put_with_sharding(x, s), tree)


def initialize_distributed() -> bool:
    """Multi-host bootstrap: call ``jax.distributed.initialize()``.

    The reference's equivalent is torchrun c10d rendezvous + NCCL init
    (sagemaker-entrypoint.sh:103-140) — it ALWAYS rendezvous.  Likewise
    here: on Cloud TPU pod VMs no coordinator env vars are pre-set; JAX
    autodetects the coordinator from the TPU metadata, but only if
    ``initialize()`` is actually called.  So we always attempt it and only
    swallow the failure on boxes that are recognizably NOT a pod slice
    (local dev / CI), where single-process is the correct outcome.

    Explicit coordinator env vars (``JAX_COORDINATOR_ADDRESS`` — also used
    by the CPU-simulation integration test) and Megascale multi-slice env
    feed straight into the same call.  Set ``ADD_GYM_NO_DISTRIBUTED=1`` to
    opt out entirely.  Returns True iff jax.distributed was initialized.
    """
    import os

    if os.environ.get("ADD_GYM_NO_DISTRIBUTED"):
        return False
    try:
        jax.distributed.initialize()
        return True
    except Exception as e:
        # Loud failure if the environment says "pod" but bootstrap failed:
        # continuing would silently train N independent single-host runs.
        hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hostnames.split(",") if h]) > 1:
            raise RuntimeError(
                "multi-host TPU slice detected (TPU_WORKER_HOSTNAMES="
                f"{hostnames!r}) but jax.distributed.initialize() failed"
            ) from e
        if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            raise
        return False
