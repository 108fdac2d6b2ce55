"""Robot configuration: regex tag lookups and PD gain tables.

Mirrors the reference ``add_gym/robot.py`` (Manipulator): link/joint regex
tags from the robot config drive per-group PD gains (robot.py:133-163) and
the action space (robot.py:183-212, handled in ImitationEnv).  Here the
result is plain arrays handed to the engine, not a stateful wrapper.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

from add_gym_tpu.physics.model import PhysicsModel

# hard-coded per-group gains, ref robot.py:133-163
_GROUP_GAINS = {
    "ankle": 120.0,
    "knee": 120.0,
    "hip": 80.0,
    "core": 50.0,
    "arm": 50.0,
    "hand": 20.0,
}
_DEFAULT_GAIN = 100.0

DEFAULT_JOINT_TAGS = [
    {"match": r"root_joint|floating_base_joint", "tags": ["base"]},
    {"match": r".*(waist).*", "tags": ["core", "upper_body"]},
    {"match": r".*(hip|knee|ankle).*", "tags": ["lower_body", "leg"]},
    {"match": r".*(hip).*", "tags": ["hip"]},
    {"match": r".*(knee).*", "tags": ["knee"]},
    {"match": r".*(ankle).*", "tags": ["ankle"]},
    {"match": r".*(shoulder|elbow|wrist).*", "tags": ["upper_body", "arm"]},
    {"match": r".*(hand|thumb).*", "tags": ["upper_body", "hand"]},
]


def build_joint_lookup(joint_names: List[str], joint_cfg=None) -> Dict[str, List[int]]:
    """Tag -> dof indices, via regex fullmatch.  Ref: robot.py:88-123."""
    joint_cfg = joint_cfg or DEFAULT_JOINT_TAGS
    lookup: Dict[str, List[int]] = {}
    for di, name in enumerate(joint_names):
        for cfg in joint_cfg:
            if re.fullmatch(cfg["match"], name):
                for tag in cfg["tags"]:
                    lookup.setdefault(tag, []).append(di)
    return lookup


DEFAULT_LINK_TAGS = [
    {"match": r"pelvis", "tags": ["base", "core"]},
    {"match": r".*(waist|torso).*", "tags": ["core", "upper_body"]},
    {"match": r".*(hip|knee).*", "tags": ["lower_body", "leg"]},
    {"match": r".*(ankle).*", "tags": ["lower_body", "leg", "feet"]},
    {"match": r".*(shoulder|elbow|wrist).*", "tags": ["upper_body", "arm"]},
    {"match": r".*(hand|thumb).*", "tags": ["upper_body", "hand"]},
]


def build_link_lookup(body_names: List[str], link_cfg=None) -> Dict[str, List[int]]:
    """Tag -> body indices, via regex fullmatch.  Ref: robot.py:88-103."""
    link_cfg = link_cfg or DEFAULT_LINK_TAGS
    lookup: Dict[str, List[int]] = {}
    for bi, name in enumerate(body_names):
        for cfg in link_cfg:
            if re.fullmatch(cfg["match"], name):
                for tag in cfg["tags"]:
                    lookup.setdefault(tag, []).append(bi)
    return lookup


def build_pd_gains(model: PhysicsModel, joint_cfg=None, gain_scale: float = 1.2):
    """kp/kv arrays for the engine.  Ref: robot.py:133-163 (damping 2*sqrt(kp))."""
    joint_names = list(model.joint_names)
    lookup = build_joint_lookup(joint_names, joint_cfg)

    kp = np.full(model.nd, _DEFAULT_GAIN, np.float32)
    covered = np.zeros(model.nd, bool)
    for tag, gain in _GROUP_GAINS.items():
        idx = lookup.get(tag, [])
        kp[idx] = gain
        covered[idx] = True
    if not covered.all():
        missing = [joint_names[i] for i in np.where(~covered)[0]]
        raise ValueError(f"Joints without PD gain assignment: {missing}")
    kp *= gain_scale
    kv = 2.0 * np.sqrt(kp)
    return kp, kv


class Robot:
    """Manipulator-equivalent facade (reference robot.py:12-330) over the
    functional design: static robot description + pure state accessors.

    The reference wraps a stateful engine entity; here state flows through
    ``SimState``/``EnvState`` pytrees, so this class holds the static pieces
    (lookups, gains, default pose, action space) and provides pure helpers
    for the stateful queries.
    """

    def __init__(
        self,
        model: PhysicsModel,
        link_cfg=None,
        joint_cfg=None,
        gain_scale: float = 1.2,
        default_angles: Dict[str, float] | None = None,
        ground_clearance: float = 1e-3,
    ):
        self.model = model
        self.link_lookup = build_link_lookup(model.body_names, link_cfg)
        self.joint_lookup = build_joint_lookup(list(model.joint_names), joint_cfg)
        self.kp, self.kv = build_pd_gains(model, joint_cfg, gain_scale)

        # default joint angles with per-joint overrides (robot.py:125-131)
        self.default_dof_pos = np.zeros(model.nd, np.float32)
        for joint_name, angle in (default_angles or {}).items():
            di = list(model.joint_names).index(joint_name)
            self.default_dof_pos[di] = float(angle)

        # init base height from collision-geometry ground clearance at the
        # default pose (robot.py:165-181 AABB offset)
        self.base_init_pos = self._init_pos_from_geometry(ground_clearance)
        self.base_init_quat = np.asarray([1.0, 0, 0, 0], np.float32)

        # action space = joint-limit mid +- 1.4 x half-range (robot.py:183-212)
        lim = np.asarray(model.dof_limit)
        mid = 0.5 * (lim[:, 0] + lim[:, 1])
        scale = 1.4 * np.maximum(np.abs(lim[:, 1] - mid), np.abs(lim[:, 0] - mid))
        self.action_low = (mid - scale).astype(np.float32)
        self.action_high = (mid + scale).astype(np.float32)

    def _init_pos_from_geometry(self, clearance: float) -> np.ndarray:
        import jax.numpy as jnp
        from dataclasses import replace

        from add_gym_tpu.physics.engine import default_state, forward_kinematics

        s = default_state(self.model, 1)
        s = replace(s, dof_pos=jnp.asarray(self.default_dof_pos)[None])
        bp, br = forward_kinematics(self.model, s)
        cpw = bp[:, self.model.cp_body] + jnp.einsum(
            "npij,pj->npi", br[:, self.model.cp_body],
            jnp.asarray(self.model.cp_pos),
        )
        low = float((cpw[..., 2] - jnp.asarray(self.model.cp_radius)).min())
        return np.asarray([0.0, 0.0, -low + clearance], np.float32)

    # ------------------------------------------------------------- lookups

    def links_by_tag(self, tag: str) -> List[int]:
        return self.link_lookup[tag]

    def joints_by_tag(self, tag: str) -> List[int]:
        return self.joint_lookup[tag]

    # ------------------------------------------ pure state accessors (SimState)

    @staticmethod
    def base_pos(sim):
        return sim.root_pos

    @staticmethod
    def base_quat(sim):
        return sim.root_quat

    @staticmethod
    def dof_pos(sim):
        return sim.dof_pos

    @staticmethod
    def dof_vel(sim):
        return sim.dof_vel

    def body_poses(self, sim):
        """World position/orientation of every body via FK: ([N, nb, 3],
        [N, nb, 3, 3]).  Ref: base_engine.py:268-296 link states."""
        from add_gym_tpu.physics.engine import forward_kinematics

        return forward_kinematics(self.model, sim)

    def ground_contact_flags(self, body_contact, tag_or_ids="feet"):
        """Per-env bool: any tagged body touching the ground.

        ``body_contact`` is the [N, nb] normal-force map from the engine
        step.  Ref: robot.py:214-231 (contact queries).
        """
        ids = (
            self.links_by_tag(tag_or_ids)
            if isinstance(tag_or_ids, str)
            else list(tag_or_ids)
        )
        return (body_contact[:, ids] > 0).any(axis=-1)

    def default_sim_state(self, num_envs: int):
        """Standing SimState at the geometry-derived init height
        (ref robot.py:239-261 reset)."""
        import jax.numpy as jnp
        from dataclasses import replace

        from add_gym_tpu.physics.engine import default_state

        s = default_state(self.model, num_envs)
        return replace(
            s,
            root_pos=jnp.broadcast_to(
                jnp.asarray(self.base_init_pos), (num_envs, 3)
            ),
            dof_pos=jnp.broadcast_to(
                jnp.asarray(self.default_dof_pos), (num_envs, self.model.nd)
            ),
            pd_target=jnp.broadcast_to(
                jnp.asarray(self.default_dof_pos), (num_envs, self.model.nd)
            ),
        )
