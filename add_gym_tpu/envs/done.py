"""Episode termination flags (pure function).

Ports ``add_gym/learning/add/add_done.py:96-147``: TIME on episode length,
SUCC at motion end for non-WRAP clips, FAIL on disallowed ground contact or
pose error — fully on-device (the reference's contact decode is a CPU
round-trip, mjwarp_engine.py:896-986; here contact flags come straight from
the engine's contact forces).
"""

from __future__ import annotations

import enum

import jax.numpy as jnp


class DoneFlags(enum.IntEnum):
    """Ref: base_agent.py:16-20."""

    NULL = 0
    FAIL = 1
    SUCC = 2
    TIME = 3


def compute_done(
    time, root_pos, dof_pos, tar_root_pos, tar_dof_pos,
    body_contact,          # [N, nb] normal force per body from the engine
    motion_times, motion_len, motion_len_term,
    *, ep_len: float, noncontact_body_mask,  # [nb] bool: bodies that must not touch
    pose_termination: bool, pose_termination_dist: float,
    enable_early_termination: bool, track_root: bool,
):
    N = time.shape[0]
    done = jnp.full((N,), int(DoneFlags.NULL), jnp.int32)

    timeout = time >= ep_len
    done = jnp.where(timeout, int(DoneFlags.TIME), done)

    motion_end = (motion_times >= motion_len) & motion_len_term
    done = jnp.where(motion_end, int(DoneFlags.SUCC), done)

    if enable_early_termination:
        mask = jnp.asarray(noncontact_body_mask)
        bad_contact = jnp.any((body_contact > 0.0) & mask[None, :], axis=-1)
        failed = bad_contact

        if pose_termination:
            dof_err = jnp.mean((tar_dof_pos - dof_pos) ** 2, axis=-1)
            pose_fail = dof_err > pose_termination_dist
            if track_root:
                root_err = jnp.sum((tar_root_pos - root_pos) ** 2, axis=-1)
                pose_fail = pose_fail | (root_err > pose_termination_dist)
            failed = failed | pose_fail

        failed = failed & (time > 0.0)
        done = jnp.where(failed, int(DoneFlags.FAIL), done)

    return done
