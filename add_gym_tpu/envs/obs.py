"""Observation builders for the imitation task (pure functions).

Ports the semantics of the reference's jit graph in
``add_gym/learning/add/add_observation.py:422-717`` to shape-static JAX.
Config flags are Python-level statics baked into the jitted step.

Default task config (configs/task/pose.yaml): global_obs=True,
root_height_obs=True, enable_tar_obs=True (steps 1..6), phase obs off,
vel obs off, disc history of 3 steps.
"""

from __future__ import annotations

import jax.numpy as jnp

import add_gym_tpu.mathx.rotations as rot


def compute_char_obs(
    root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel,
    enable_vel_obs: bool, global_obs: bool, root_height_obs: bool,
):
    """Character state obs.  Ref: add_observation.py:422-459."""
    obs = []
    if root_height_obs:
        obs.append(root_pos[..., 2:3])

    if global_obs:
        root_rot_obs = rot.quat_to_tan_norm(root_rot)
    else:
        heading_inv = rot.calc_heading_quat_inv(root_rot)
        root_rot_obs = rot.quat_to_tan_norm(rot.quat_mul(heading_inv, root_rot))
    obs.append(root_rot_obs)
    obs.append(dof_pos)

    if enable_vel_obs:
        if global_obs:
            obs += [root_vel, root_ang_vel, dof_vel]
        else:
            heading_inv = rot.calc_heading_quat_inv(root_rot)
            obs += [
                rot.quat_rotate(heading_inv, root_vel),
                rot.quat_rotate(heading_inv, root_ang_vel),
                dof_vel,
            ]
    return jnp.concatenate(obs, axis=-1)


def compute_tar_obs(
    ref_root_pos, ref_root_rot, tar_root_pos, tar_root_rot, tar_dof_pos,
    global_obs: bool, root_height_obs: bool,
):
    """Future-target obs relative to a reference frame.

    Ref: add_observation.py:578-650.  tar_* have a steps axis [..., K, d];
    ref_* are [..., d].
    """
    root_pos_obs = tar_root_pos - ref_root_pos[..., None, :]

    root_rot = tar_root_rot
    if not global_obs:
        heading_inv = rot.calc_heading_quat_inv(ref_root_rot)[..., None, :]
        root_pos_obs = rot.quat_rotate(
            jnp.broadcast_to(heading_inv, tar_root_rot.shape), root_pos_obs
        )
        root_rot = rot.quat_mul(
            jnp.broadcast_to(heading_inv, tar_root_rot.shape), tar_root_rot
        )

    if root_height_obs:
        root_pos_obs = root_pos_obs.at[..., 2].set(tar_root_pos[..., 2])
    else:
        root_pos_obs = root_pos_obs[..., :2]

    root_rot_obs = rot.quat_to_tan_norm(root_rot)
    obs = jnp.concatenate([root_pos_obs, root_rot_obs, tar_dof_pos], axis=-1)
    return obs.reshape(obs.shape[:-2] + (obs.shape[-2] * obs.shape[-1],))


def compute_phase_obs(phase, num_phase_encoding: int):
    """Sinusoidal phase encoding.  Ref: add_observation.py:557-575."""
    phase_obs = phase[..., None]
    if num_phase_encoding > 0:
        pe_scale = 2.0 * jnp.pi * (2.0 ** jnp.arange(num_phase_encoding))
        pe_val = phase[..., None] * pe_scale
        phase_obs = jnp.concatenate(
            [phase_obs, jnp.sin(pe_val), jnp.cos(pe_val)], axis=-1
        )
    return phase_obs


def compute_disc_obs(
    root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel,
    enable_vel_obs: bool, global_obs: bool,
):
    """Discriminator obs over a history window [..., H, d] -> flat.

    Ref: add_observation.py:462-554 (pos obs + optional vel obs).
    """
    pos = root_pos
    if not global_obs:
        pos = pos.at[..., 0:2].set(0.0)
    root_rot_obs = rot.quat_to_tan_norm(root_rot)
    parts = [pos, root_rot_obs, dof_pos]
    if enable_vel_obs:
        if global_obs:
            parts += [root_vel, root_ang_vel, dof_vel]
        else:
            heading_inv = rot.calc_heading_quat_inv(root_rot)
            parts += [
                rot.quat_rotate(heading_inv, root_vel),
                rot.quat_rotate(heading_inv, root_ang_vel),
                dof_vel,
            ]
    obs = jnp.concatenate(parts, axis=-1)
    return obs.reshape(obs.shape[:-2] + (obs.shape[-2] * obs.shape[-1],))


def compute_add_obs(
    root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel,
    phase, tar_root_pos, tar_root_rot, tar_dof_pos,
    *, enable_vel_obs: bool, global_obs: bool, root_height_obs: bool,
    enable_phase_obs: bool, num_phase_encoding: int, enable_tar_obs: bool,
):
    """Full actor/critic observation.  Ref: add_observation.py:653-717."""
    obs = [
        compute_char_obs(
            root_pos, root_rot, root_vel, root_ang_vel, dof_pos, dof_vel,
            enable_vel_obs, global_obs, root_height_obs,
        )
    ]
    if enable_phase_obs:
        obs.append(compute_phase_obs(phase, num_phase_encoding))
    if enable_tar_obs:
        if global_obs:
            ref_root_pos, ref_root_rot = root_pos, root_rot
        else:
            ref_root_pos = tar_root_pos[..., 0, :]
            ref_root_rot = tar_root_rot[..., 0, :]
        obs.append(
            compute_tar_obs(
                ref_root_pos, ref_root_rot, tar_root_pos, tar_root_rot,
                tar_dof_pos, global_obs, root_height_obs,
            )
        )
    return jnp.concatenate(obs, axis=-1)
