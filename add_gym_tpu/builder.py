"""Assemble env + agent from a composed config dict.

Equivalent construction path to the reference's ``ADDAgent.__init__``
(SURVEY.md §3.2): engine/model build, motion library load, task components,
agent — but producing pure functional objects.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from add_gym_tpu.envs.domain_rand import DRConfig
from add_gym_tpu.envs.imitation import ImitationEnv, TaskConfig
from add_gym_tpu.kinematics.char_model import load_char_model
from add_gym_tpu.learning.add_agent import ADDAgent, AgentConfig
from add_gym_tpu.motion.motion_lib import load_motion_lib
from add_gym_tpu.physics.engine import EngineParams
from add_gym_tpu.physics.model import build_physics_model
from add_gym_tpu.robot import build_pd_gains
from add_gym_tpu.utils.assets import asset_path

# the motion files store joints in this fixed order (reference
# configs/task/pose.yaml motion_joint_order); columns are remapped to the
# BFS client order at load
MOTION_JOINT_ORDER = [
    "left_hip_pitch_joint", "left_hip_roll_joint", "left_hip_yaw_joint",
    "left_knee_joint", "left_ankle_pitch_joint", "left_ankle_roll_joint",
    "right_hip_pitch_joint", "right_hip_roll_joint", "right_hip_yaw_joint",
    "right_knee_joint", "right_ankle_pitch_joint", "right_ankle_roll_joint",
    "waist_yaw_joint", "waist_roll_joint", "waist_pitch_joint",
    "left_shoulder_pitch_joint", "left_shoulder_roll_joint",
    "left_shoulder_yaw_joint", "left_elbow_joint",
    "left_wrist_roll_joint", "left_wrist_pitch_joint", "left_wrist_yaw_joint",
    "right_shoulder_pitch_joint", "right_shoulder_roll_joint",
    "right_shoulder_yaw_joint", "right_elbow_joint",
    "right_wrist_roll_joint", "right_wrist_pitch_joint", "right_wrist_yaw_joint",
]


def _resolve_motion_file(path: str) -> str:
    """Resolve a motion file or manifest: as-given, package-relative
    (configs/...), or under the asset root."""
    import os

    if os.path.exists(path):
        return path
    pkg_rel = os.path.join(os.path.dirname(os.path.abspath(__file__)), path)
    if os.path.exists(pkg_rel):
        return pkg_rel
    return asset_path(path)


def build_env(cfg: Dict, mesh=None) -> ImitationEnv:
    robot_cfg = cfg.get("robot", {})
    engine_cfg = cfg.get("engine", {})
    task_cfg = cfg.get("task", {})

    mjcf = asset_path(robot_cfg.get("asset_path", "g1_description/g1_29.xml"))
    char = load_char_model(mjcf)
    model = build_physics_model(mjcf, char)

    kp, kv = build_pd_gains(
        model,
        joint_cfg=robot_cfg.get("joints"),
        gain_scale=robot_cfg.get("gain_scale", 1.2),
    )
    params = EngineParams(
        kp=jnp.asarray(kp),
        kv=jnp.asarray(kv),
        ctrl_dt=float(engine_cfg.get("ctrl_dt", 0.01)),
        substeps=int(engine_cfg.get("substeps", 4)),
        max_torque=float(engine_cfg.get("max_torque", 200.0)),
        max_target_delta=float(engine_cfg.get("max_target_delta", 0.5)),
        position_limit_margin=float(engine_cfg.get("position_limit_margin", 1e-4)),
        contact_timeconst=float(engine_cfg.get("contact_timeconst", 0.02)),
        contact_dampratio=float(engine_cfg.get("contact_dampratio", 1.0)),
        friction_mu=float(engine_cfg.get("friction_mu", 1.0)),
    )

    motion = load_motion_lib(
        _resolve_motion_file(
            task_cfg.get("motion_file", "motions/dance1_subject3.motion")
        ),
        task_cfg.get("motion_joint_order", MOTION_JOINT_ORDER),
        char,
        dt=params.ctrl_dt,
    )

    sampler_cfg = task_cfg.get("sampler", {}) or {}
    task = TaskConfig(
        max_episode_length=float(task_cfg.get("max_episode_length", 20)),
        global_obs=bool(task_cfg.get("global_obs", True)),
        root_height_obs=bool(task_cfg.get("root_height_obs", True)),
        pose_termination=bool(task_cfg.get("pose_termination", True)),
        pose_termination_dist=float(task_cfg.get("pose_termination_dist", 1.0)),
        enable_phase_obs=bool(task_cfg.get("enable_phase_obs", False)),
        enable_tar_obs=bool(task_cfg.get("enable_tar_obs", True)),
        num_phase_encoding=int(task_cfg.get("num_phase_encoding", 4)),
        tar_obs_steps=tuple(task_cfg.get("tar_obs_steps", (1, 2, 3, 4, 5, 6))),
        num_disc_obs_steps=int(task_cfg.get("num_disc_obs_steps", 3)),
        rand_reset=bool(task_cfg.get("rand_reset", True)),
        enable_early_termination=bool(task_cfg.get("enable_early_termination", True)),
        enable_vel_obs=bool(task_cfg.get("enable_vel_obs", False)),
        contact_bodies=tuple(task_cfg.get("contact_bodies", ())),
        reward_pose_w=float(task_cfg.get("reward_pose_w", 0.5)),
        reward_vel_w=float(task_cfg.get("reward_vel_w", 0.1)),
        reward_root_pose_w=float(task_cfg.get("reward_root_pose_w", 0.15)),
        reward_root_vel_w=float(task_cfg.get("reward_root_vel_w", 0.1)),
        reward_pose_scale=float(task_cfg.get("reward_pose_scale", 0.25)),
        reward_vel_scale=float(task_cfg.get("reward_vel_scale", 0.01)),
        reward_root_pose_scale=float(task_cfg.get("reward_root_pose_scale", 5.0)),
        reward_root_vel_scale=float(task_cfg.get("reward_root_vel_scale", 1.0)),
        sampler_num_segments=int(sampler_cfg.get("num_segments", 20)),
        sampler_temperature=sampler_cfg.get("temperature"),
    )
    # physics backend selection: "auto" uses the Pallas megakernel on TPU
    # (single chip directly; multi-device via the shard_map wrapper,
    # tests/test_pallas_mini.py) and the XLA fused path everywhere else.
    # Per-device env counts must be 128-multiples (pallas_step.pick_block).
    # DR params (incl. per-env mass_scale) ride into the kernel as [.., N]
    # inputs (pallas_step use_ms), so DR does NOT exclude the kernel.
    num_envs = int(engine_cfg.get("num_envs", 256))
    pallas_cfg = engine_cfg.get("pallas", "auto")

    dr_cfg = engine_cfg.get("domain_rand", {}) or {}
    dr = DRConfig(
        enabled=bool(dr_cfg.get("enabled", False)),
        kp_scale_range=tuple(dr_cfg.get("kp_scale_range", (0.8, 1.2))),
        kv_scale_range=tuple(dr_cfg.get("kv_scale_range", (0.8, 1.2))),
        friction_range=tuple(dr_cfg.get("friction_range", (0.6, 1.4))),
        action_latency_range=tuple(
            dr_cfg.get("action_latency_range", (0.0, 0.0))
        ),
        mass_range=tuple(dr_cfg.get("mass_range", (1.0, 1.0))),
    )
    # general geom-geom narrowphase (physics/narrowphase.py GeomSet):
    # evaluated as held per-control-step wrenches on every backend — the
    # fused XLA path computes them inline (fused_step.compute_np_ext); the
    # Pallas kernel takes them as an extra [6*n_touched, N] input
    # (pallas_step np_rows), so general_narrowphase keeps the fastest
    # physics path
    general_np = bool(engine_cfg.get("general_narrowphase", False))
    if general_np:
        from add_gym_tpu.physics.model import attach_geoms

        model = attach_geoms(model, mjcf)

    if pallas_cfg == "auto":
        ndev = jax.device_count()
        # DR (incl. per-env mass_scale) rides into the kernel as [.., N]
        # inputs; on a mesh, per-env param leaves shard along the env axis
        # inside sharded_pallas_step
        use_pallas = (
            jax.default_backend() == "tpu"
            and (num_envs // ndev) % 128 == 0
            and (ndev == 1 or mesh is not None)
        )
    elif isinstance(pallas_cfg, str):
        # config values arrive as strings for this key ("auto" is one) —
        # bool("off") would silently force the kernel ON
        low = pallas_cfg.lower()
        if low in ("on", "true", "1"):
            use_pallas = True
        elif low in ("off", "false", "0"):
            use_pallas = False
        else:
            raise ValueError(
                f"engine.pallas must be auto/on/off, got {pallas_cfg!r}"
            )
    else:
        use_pallas = bool(pallas_cfg)
    return ImitationEnv(
        model, motion, params, task,
        fused=bool(engine_cfg.get("fused", True)),
        pallas=use_pallas,
        dr=dr,
        mesh=mesh if jax.device_count() > 1 else None,
        char=char,
    )


def build_agent(cfg: Dict, env: ImitationEnv, key=None) -> ADDAgent:
    a = cfg.get("agent", {})
    agent_cfg = AgentConfig(
        discount=float(a.get("discount", 0.99)),
        td_lambda=float(a.get("td_lambda", 0.95)),
        steps_per_iter=int(a.get("steps_per_iter", 32)),
        update_epochs=int(a.get("update_epochs", 5)),
        batch_size=int(a.get("batch_size", 4)),
        ppo_clip_ratio=float(a.get("ppo_clip_ratio", 0.2)),
        norm_adv_clip=float(a.get("norm_adv_clip", 4.0)),
        action_bound_weight=float(a.get("action_bound_weight", 10.0)),
        action_entropy_weight=float(a.get("action_entropy_weight", 0.0)),
        action_reg_weight=float(a.get("action_reg_weight", 0.0)),
        critic_loss_weight=float(a.get("critic_loss_weight", 1.0)),
        learning_rate=float(a.get("learning_rate", 1e-4)),
        grad_clip=float(a.get("grad_clip", 1.0)),
        optimizer=a.get("optimizer", "adam"),
        momentum=float(a.get("momentum", 0.9)),
        disc_loss_weight=float(a.get("disc_loss_weight", 0.5)),
        disc_logit_reg=float(a.get("disc_logit_reg", 0.01)),
        disc_grad_penalty=float(a.get("disc_grad_penalty", 20.0)),
        disc_weight_decay=float(a.get("disc_weight_decay", 1e-4)),
        disc_reward_scale=float(a.get("disc_reward_scale", 2.0)),
        task_reward_weight=float(a.get("task_reward_weight", 0.0)),
        disc_reward_weight=float(a.get("disc_reward_weight", 1.0)),
        action_std=float(a.get("action_std", 0.05)),
        actor_std_type=a.get("actor_std_type", "fixed"),
        exp_prob=float(a.get("exp_prob", 1.0)),
        exp_prob_end=float(a.get("exp_prob_end", 1.0)),
        exp_anneal_samples=float(a.get("exp_anneal_samples", float("inf"))),
        normalizer_samples=float(a.get("normalizer_samples", 1e8)),
        disc_mode=a.get("disc_mode", "add"),
        actor_net=a.get("actor_net", "fc_3layers_1024units"),
        critic_net=a.get("critic_net", "fc_3layers_1024units"),
        disc_net=a.get("disc_net", "fc_2layers_1024units"),
        actor_init_output_scale=float(a.get("actor_init_output_scale", 0.01)),
        mixed_precision=bool(a.get("mixed_precision", False)),
        disc_mixed_precision=bool(a.get("disc_mixed_precision", False)),
        minibatch_blocks=a.get("minibatch_blocks", "auto"),
    )
    if key is None:
        key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    return ADDAgent(env, agent_cfg, key)
