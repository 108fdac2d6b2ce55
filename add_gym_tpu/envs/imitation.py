"""Imitation environment: device-resident, shape-static, scan-friendly.

Functional replacement for the reference environment/task stack
(``envs/env.py`` + ``learning/add/add_observation|reward|done|motion``):
one ``EnvState`` pytree and pure ``step`` / ``reset_where`` / ``compute_obs``
functions designed to live inside ``lax.scan`` rollouts.  Resets are masked
``jnp.where`` merges (SURVEY.md §7.1) — no host round-trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

import add_gym_tpu.mathx.rotations as rot
from add_gym_tpu.envs import obs as obs_mod
from add_gym_tpu.envs.domain_rand import DRConfig, init_dr_state, sample_dr
from add_gym_tpu.envs.done import DoneFlags, compute_done
from add_gym_tpu.envs.reward import compute_reward
from add_gym_tpu.kinematics.char_model import CharModel
from add_gym_tpu.learning import sampler as sampler_mod
from add_gym_tpu.motion.motion_lib import MotionLib
from add_gym_tpu.physics.engine import EngineParams, SimState, default_state, step as engine_step
from add_gym_tpu.physics.model import PhysicsModel


@dataclass(frozen=True)
class TaskConfig:
    """Static task parameters (configs/task/pose.yaml)."""

    max_episode_length: float = 20.0
    global_obs: bool = True
    root_height_obs: bool = True
    pose_termination: bool = True
    pose_termination_dist: float = 1.0
    enable_phase_obs: bool = False
    enable_tar_obs: bool = True
    num_phase_encoding: int = 4
    tar_obs_steps: Sequence[int] = (1, 2, 3, 4, 5, 6)
    num_disc_obs_steps: int = 3
    rand_reset: bool = True
    enable_early_termination: bool = True
    enable_vel_obs: bool = False
    contact_bodies: Sequence[str] = (
        "left_knee_link", "left_ankle_pitch_link", "left_ankle_roll_link",
        "right_knee_link", "right_ankle_pitch_link", "right_ankle_roll_link",
    )
    # reward weights/scales
    reward_pose_w: float = 0.5
    reward_vel_w: float = 0.1
    reward_root_pose_w: float = 0.15
    reward_root_vel_w: float = 0.1
    reward_pose_scale: float = 0.25
    reward_vel_scale: float = 0.01
    reward_root_pose_scale: float = 5.0
    reward_root_vel_scale: float = 1.0
    sampler_num_segments: int = 20
    sampler_temperature: float | None = None

    @property
    def track_root(self) -> bool:
        # ref: add_observation.py:349-350 (_track_global_root)
        return self.enable_tar_obs and self.global_obs


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class EnvState:
    """Batched environment state (sim + task bookkeeping + disc history)."""

    sim: SimState
    time: jnp.ndarray            # [N]
    motion_ids: jnp.ndarray      # [N] int32
    motion_offsets: jnp.ndarray  # [N]
    done: jnp.ndarray            # [N] int32 DoneFlags
    # discriminator history, oldest -> newest along axis 1 (H steps)
    hist_root_pos: jnp.ndarray   # [N, H, 3]
    hist_root_rot: jnp.ndarray   # [N, H, 4]
    hist_root_vel: jnp.ndarray   # [N, H, 3]
    hist_root_ang_vel: jnp.ndarray  # [N, H, 3]
    hist_dof_pos: jnp.ndarray    # [N, H, D]
    hist_dof_vel: jnp.ndarray    # [N, H, D]
    # per-env domain-randomization state {kp_scale, kv_scale, friction_mu}
    dr: dict


class ImitationEnv:
    """Host-side factory binding model + motion data + config into pure fns.

    The pure functions close over static arrays; all runtime data flows
    through ``EnvState`` so everything jits/shards cleanly.
    """

    def __init__(
        self,
        model: PhysicsModel,
        motion: MotionLib,
        engine_params: EngineParams,
        task: TaskConfig = TaskConfig(),
        fused: bool = True,
        pallas: bool = False,
        dr: DRConfig = DRConfig(),
        mesh=None,
        char=None,
    ):
        self.model = model
        self.mesh = mesh   # device mesh (None on a single device)
        self._char = char  # kinematic CharModel (viewer / video rendering)
        self.motion = motion
        self.params = engine_params
        self.task = task
        self.dr = dr
        self.ctrl_dt = engine_params.ctrl_dt
        # Physics backends (same math, pinned by tests/test_fused_step.py,
        # tests/test_pallas_step.py and tests/test_pallas_mini.py):
        #   pallas — one Pallas megakernel per control step (fastest on TPU;
        #            on a multi-device mesh wrapped in shard_map over the
        #            env axis — sharded_pallas_step)
        #   fused  — stacked env-minor XLA path (~15-26x over reference
        #            layout; shards transparently under GSPMD)
        #   neither — reference [N, ...] layout (engine.step)
        self.fused = fused
        self.pallas = pallas
        if pallas:
            from add_gym_tpu.physics.fused_step import FusedModelConstants
            from add_gym_tpu.physics.pallas_step import (
                pallas_step, sharded_pallas_step,
            )

            self._fc = FusedModelConstants(model)
            if mesh is not None:
                # per-env DR params shard along the env axis inside
                # sharded_pallas_step; shared params stay closure-captured
                self._step_fn = lambda p, s, t: sharded_pallas_step(
                    self._fc, mesh, p, s, t
                )
            else:
                self._step_fn = lambda p, s, t: pallas_step(self._fc, p, s, t)
        elif fused:
            from add_gym_tpu.physics.fused_step import (
                FusedModelConstants, fused_step,
            )

            self._fc = FusedModelConstants(model)
            self._step_fn = lambda p, s, t: fused_step(self._fc, p, s, t)
        else:
            self._step_fn = lambda p, s, t: engine_step(self.model, p, s, t)

        contact_set = set(task.contact_bodies)
        self.noncontact_mask = np.array(
            [name not in contact_set for name in model.body_names], dtype=bool
        )
        self.tar_steps = np.asarray(task.tar_obs_steps, np.int32)
        nseg = task.sampler_num_segments
        self.seg_sizes = motion.lengths / nseg
        self.min_start_time = (task.num_disc_obs_steps - 1) * self.ctrl_dt

        # ref: robot.py:183-212 — action bounds = limits mid +- 1.4 x half-range
        lim = np.asarray(model.dof_limit)
        mid = 0.5 * (lim[:, 0] + lim[:, 1])
        scale = 1.4 * np.maximum(np.abs(lim[:, 1] - mid), np.abs(lim[:, 0] - mid))
        self.action_low = mid - scale
        self.action_high = mid + scale

    # ------------------------------------------------------------- obs sizes

    @property
    def num_dofs(self) -> int:
        return self.model.nd

    def obs_dim(self) -> int:
        d = self.model.nd
        char = (1 if self.task.root_height_obs else 0) + 6 + d
        if self.task.enable_vel_obs:
            char += 3 + 3 + d
        total = char
        if self.task.enable_phase_obs:
            total += 1 + 2 * self.task.num_phase_encoding
        if self.task.enable_tar_obs:
            per = (3 if self.task.root_height_obs else 2) + 6 + d
            total += per * len(self.tar_steps)
        return total

    def disc_obs_dim(self) -> int:
        d = self.model.nd
        per = 3 + 6 + d
        if self.task.enable_vel_obs:
            per += 3 + 3 + d
        return per * self.task.num_disc_obs_steps

    # -------------------------------------------------------------- builders

    def init_state(self, num_envs: int) -> EnvState:
        H, D = self.task.num_disc_obs_steps, self.model.nd
        z = lambda *s: jnp.zeros((num_envs,) + s)
        quat = jnp.zeros((num_envs, H, 4)).at[..., 0].set(1.0)
        return EnvState(
            sim=default_state(self.model, num_envs),
            time=z(),
            motion_ids=jnp.zeros(num_envs, jnp.int32),
            motion_offsets=z(),
            done=jnp.zeros(num_envs, jnp.int32),
            hist_root_pos=z(H, 3),
            hist_root_rot=quat,
            hist_root_vel=z(H, 3),
            hist_root_ang_vel=z(H, 3),
            hist_dof_pos=z(H, D),
            hist_dof_vel=z(H, D),
            dr=init_dr_state(num_envs),
        )

    # ----------------------------------------------------------------- steps

    def motion_times(self, state: EnvState):
        return state.time + state.motion_offsets

    def _effective_params(self, state: EnvState) -> EngineParams:
        """Apply per-env domain-randomization scales to the engine params."""
        if not self.dr.enabled:
            return self.params
        dr = state.dr
        p = replace(
            self.params,
            kp=self.params.kp[None, :] * dr["kp_scale"][:, None],
            kv=self.params.kv[None, :] * dr["kv_scale"][:, None],
            friction_mu=jnp.asarray(self.params.friction_mu) * dr["friction_mu"],
        )
        if self.dr.mass_enabled:
            p = replace(
                p, mass_scale=jnp.asarray(p.mass_scale) * dr["mass_scale"]
            )
        return p

    def step(self, state: EnvState, pd_target):
        """Physics step + task update.  Ref flow: add_agent.py:204-219.

        Returns (state, obs, disc_obs, disc_obs_demo, reward, done).
        """
        if self.dr.enabled and self.dr.action_latency_range[1] > 0:
            # first-order actuation delay (domain_rand.py): blend the fresh
            # command with the previously applied target
            a = state.dr["latency"][:, None]
            pd_target = (1.0 - a) * pd_target + a * state.sim.pd_target
        sim, body_contact = self._step_fn(
            self._effective_params(state), state.sim, pd_target
        )
        time = state.time + self.ctrl_dt
        state = replace(state, sim=sim, time=time)

        # reference frame at current motion time (ref: add_obs.py:163-174)
        mt = self.motion_times(state)
        ref = self.motion.get_motion_step(state.motion_ids, mt)

        # push sim state into disc history (ref: add_obs.py:195-207)
        state = self._push_history(state)

        obs = self.compute_obs(state)
        disc_obs = self._disc_obs_from_hist(state)
        disc_obs_demo = self._disc_obs_demo(state.motion_ids, mt)

        reward = compute_reward(
            sim.root_pos, sim.root_quat, sim.root_vel, sim.root_ang_vel,
            sim.dof_pos, sim.dof_vel,
            ref[0], ref[1], ref[2], ref[3], ref[4], ref[5],
            jnp.ones((self.model.nd,), sim.dof_pos.dtype),
            track_root_h=self.task.root_height_obs,
            track_root=self.task.track_root,
            pose_w=self.task.reward_pose_w,
            vel_w=self.task.reward_vel_w,
            root_pose_w=self.task.reward_root_pose_w,
            root_vel_w=self.task.reward_root_vel_w,
            pose_scale=self.task.reward_pose_scale,
            vel_scale=self.task.reward_vel_scale,
            root_pose_scale=self.task.reward_root_pose_scale,
            root_vel_scale=self.task.reward_root_vel_scale,
        )

        motion_len = self.motion.get_motion_length(state.motion_ids)
        loop_mode = self.motion.get_motion_loop_mode(state.motion_ids)
        from add_gym_tpu.motion.motion_file import LoopMode

        done = compute_done(
            time, sim.root_pos, sim.dof_pos, ref[0], ref[4], body_contact,
            mt, motion_len, loop_mode != int(LoopMode.WRAP),
            ep_len=self.task.max_episode_length,
            noncontact_body_mask=self.noncontact_mask,
            pose_termination=self.task.pose_termination,
            pose_termination_dist=self.task.pose_termination_dist,
            enable_early_termination=self.task.enable_early_termination,
            track_root=self.task.track_root,
        )
        state = replace(state, done=done)
        return state, obs, disc_obs, disc_obs_demo, reward, done

    def _window_offsets(self, dtype=jnp.float32):
        """Time offsets of the motion-row window relative to the current
        motion time: H history rows (oldest -> newest, newest = the
        reference frame) followed by the K target-lookahead rows."""
        H = self.task.num_disc_obs_steps
        K = len(self.tar_steps) if self.task.enable_tar_obs else 0
        dt = self.ctrl_dt
        win_offs = -dt * jnp.arange(H - 1, -1, -1, dtype=dtype)
        if K:
            return jnp.concatenate(
                [win_offs, dt * jnp.asarray(self.tar_steps, dtype)]
            )
        return win_offs

    @property
    def _aux_shiftable(self) -> bool:
        """The incremental aux carry requires the window offsets to be a
        consecutive dt grid (shift-by-one advances every row by exactly
        one table frame).  True for the reference task config
        (tar_obs_steps = 1..K, pose.yaml)."""
        K = len(self.tar_steps) if self.task.enable_tar_obs else 0
        return not K or bool(
            np.array_equal(np.asarray(self.tar_steps), np.arange(1, K + 1))
        )

    def motion_aux(self, state: EnvState):
        """Motion-row cache [N, H+K, R] aligned to the CURRENT motion time.

        Row j holds the packed precomputed motion row
        (``MotionLib.get_motion_rows``) at time ``mt + offsets[j]``.
        Carried through the rollout scan and advanced by shift-plus-one-
        gather per step (``rollout_step_cached``) — exact, because every
        lookup still goes through the full clamp/WRAP logic when gathered,
        and a row's value at an absolute motion time never changes.
        """
        mt = self.motion_times(state)
        offs = self._window_offsets(mt.dtype)
        times = mt[:, None] + offs[None, :]
        ids = jnp.broadcast_to(state.motion_ids[:, None], times.shape)
        return self.motion.get_motion_rows(ids, times)

    def rollout_step(self, key, state: EnvState, pd_target, sampler_state):
        """Fused train-rollout step: step + reset_where + both obs passes.

        Semantically identical to ``step`` -> ``reset_where`` ->
        ``compute_obs`` with the same key: same RNG stream, exactly equal
        done flags, values equal up to compiled-vs-compiled f32
        reassociation (pinned by
        tests/test_env.py::test_rollout_step_matches_plain_path).

        Returns ``(state3, obs_after, out)`` where ``out`` carries the
        per-step rollout record (next_obs, disc obs, reward, done, ...).
        """
        N = state.time.shape[0]
        if not self._aux_shiftable:
            # non-consecutive tar_obs_steps: the incremental cache does
            # not apply — compose the plain path (same RNG stream:
            # reset_where performs the identical 3-way key split)
            state2, next_obs, disc_obs, disc_obs_demo, reward, done = (
                self.step(state, pd_target)
            )
            out = dict(
                reward=reward, done=done, disc_obs=disc_obs,
                disc_obs_demo=disc_obs_demo, motion_ids=state.motion_ids,
                motion_times=self.motion_times(state2),
                ep_time=state2.time, next_obs=next_obs,
            )
            reset = done != int(DoneFlags.NULL)
            state3 = self.reset_where(key, state2, reset, sampler_state)
            return state3, self.compute_obs(state3), out
        k1, k2, k_dr = jax.random.split(key, 3)
        ids_f = self.motion.sample_motions(k1, N)
        times_f = self._sample_times(k2, ids_f, sampler_state)
        dr = (
            sample_dr(k_dr, self.dr, N) if self.dr.enabled
            else init_dr_state(N)
        )
        aux = self.motion_aux(state)
        state3, obs_after, _, out = self.rollout_step_cached(
            state, pd_target, aux, ids_f, times_f, dr
        )
        return state3, obs_after, out

    def rollout_step_cached(
        self, state: EnvState, pd_target, aux, ids_f, times_f, dr
    ):
        """Presampled, aux-carried rollout step (the scan hot path).

        Identical math to :meth:`rollout_step` with two structural
        optimizations (tests/test_env.py::test_rollout_step_cached_*):

        * **incremental motion window**: ``aux`` is the [N, H+K, R] packed
          motion-row cache aligned to the pre-step motion time
          (:meth:`motion_aux`); advancing one control step shifts it by
          one row and gathers ONE fresh row per env — vs H+K rows per env
          per step for the fresh gather (the rollout's dominant gather
          traffic at 4096 envs, .runs/profile_rollout_r5.log variant C);
        * **presampled resets**: ``ids_f``/``times_f``/``dr`` arrive from
          a batched pre-scan draw instead of per-step key splits (one
          large threefry call per rollout instead of 3T small ones).

        The reset-side gather (fresh window + tar at the fresh times) is
        ONE [N, H+K] packed gather whose rows double as the reset env's
        fresh aux.  The two full observation passes (pre-reset
        ``next_obs`` + post-reset ``obs``) evaluate as one stacked [N, 2]
        pass.  Returns ``(state3, obs_after, aux3, out)``.
        """
        task = self.task
        N = state.time.shape[0]
        H = task.num_disc_obs_steps
        K = len(self.tar_steps) if task.enable_tar_obs else 0
        dt = self.ctrl_dt
        assert self._aux_shiftable, (
            "rollout_step_cached requires consecutive tar_obs_steps "
            f"(got {tuple(self.tar_steps)})"
        )

        # --- physics (identical to step) -------------------------------
        if self.dr.enabled and self.dr.action_latency_range[1] > 0:
            a = state.dr["latency"][:, None]
            pd_target = (1.0 - a) * pd_target + a * state.sim.pd_target
        sim, body_contact = self._step_fn(
            self._effective_params(state), state.sim, pd_target
        )
        time = state.time + dt
        state2 = self._push_history(replace(state, sim=sim, time=time))
        mt = time + state.motion_offsets
        ids = state.motion_ids

        # --- advance the motion-row cache: shift + one fresh row -------
        new_t = mt + (K * dt if K else 0.0)
        new_row = self.motion.get_motion_rows(ids, new_t)      # [N, R]
        aux_cur = jnp.concatenate([aux[:, 1:], new_row[:, None]], axis=1)
        win = self.motion.split_rows(aux_cur[:, :H])
        ref = self.motion.split_rows(aux_cur[:, H - 1])

        disc_obs = self._disc_obs_from_hist(state2)
        disc_obs_demo = obs_mod.compute_disc_obs(
            *win, enable_vel_obs=task.enable_vel_obs, global_obs=task.global_obs,
        )

        reward = compute_reward(
            sim.root_pos, sim.root_quat, sim.root_vel, sim.root_ang_vel,
            sim.dof_pos, sim.dof_vel,
            ref[0], ref[1], ref[2], ref[3], ref[4], ref[5],
            jnp.ones((self.model.nd,), sim.dof_pos.dtype),
            track_root_h=task.root_height_obs,
            track_root=task.track_root,
            pose_w=task.reward_pose_w,
            vel_w=task.reward_vel_w,
            root_pose_w=task.reward_root_pose_w,
            root_vel_w=task.reward_root_vel_w,
            pose_scale=task.reward_pose_scale,
            vel_scale=task.reward_vel_scale,
            root_pose_scale=task.reward_root_pose_scale,
            root_vel_scale=task.reward_root_vel_scale,
        )

        meta = self.motion.meta_all[ids]                  # [N, 7]
        done = compute_done(
            time, sim.root_pos, sim.dof_pos, ref[0], ref[4], body_contact,
            mt, meta[:, 0], meta[:, 1] == 0.0,
            ep_len=task.max_episode_length,
            noncontact_body_mask=self.noncontact_mask,
            pose_termination=task.pose_termination,
            pose_termination_dist=task.pose_termination_dist,
            enable_early_termination=task.enable_early_termination,
            track_root=task.track_root,
        )
        state2 = replace(state2, done=done)

        out = dict(
            reward=reward, done=done, disc_obs=disc_obs,
            disc_obs_demo=disc_obs_demo, motion_ids=ids, motion_times=mt,
            ep_time=time,
        )

        reset = done != int(DoneFlags.NULL)
        ids3 = jnp.where(reset, ids_f, ids)
        mt3 = jnp.where(reset, times_f, mt)

        # --- reset-side gather: fresh window + fresh tar = fresh aux ---
        offs = self._window_offsets(mt.dtype)
        timesB = times_f[:, None] + offs[None, :]
        idsB = jnp.broadcast_to(ids_f[:, None], timesB.shape)
        rowsB = self.motion.get_motion_rows(idsB, timesB)  # [N, H+K, R]
        hist_f = self.motion.split_rows(rowsB[:, :H])

        tgt_lo = jnp.asarray(self.model.dof_limit[:, 0], sim.dof_pos.dtype)
        tgt_hi = jnp.asarray(self.model.dof_limit[:, 1], sim.dof_pos.dtype)
        dp_f = jnp.clip(hist_f[4][:, -1], tgt_lo, tgt_hi)
        fresh = EnvState(
            sim=SimState(
                root_pos=hist_f[0][:, -1],
                root_quat=hist_f[1][:, -1],
                root_vel=hist_f[2][:, -1],
                root_ang_vel=hist_f[3][:, -1],
                dof_pos=dp_f,
                dof_vel=hist_f[5][:, -1],
                pd_target=dp_f,
            ),
            time=jnp.zeros(N),
            motion_ids=ids_f,
            motion_offsets=times_f,
            done=jnp.zeros(N, jnp.int32),
            hist_root_pos=hist_f[0],
            hist_root_rot=hist_f[1],
            hist_root_vel=hist_f[2],
            hist_root_ang_vel=hist_f[3],
            hist_dof_pos=hist_f[4],
            hist_dof_vel=hist_f[5],
            dr=dr,
        )
        pick = lambda new, old: jnp.where(
            reset.reshape((N,) + (1,) * (new.ndim - 1)), new, old
        )
        state3 = jax.tree_util.tree_map(pick, fresh, state2)
        # post-reset aux: reset envs take the fresh rows, others keep the
        # advanced cache (rowsB's tar rows at the fresh times equal the
        # merged (ids3, mt3) tar rows exactly where reset is True)
        aux3 = jnp.where(reset[:, None, None], rowsB, aux_cur)

        # --- stacked obs pass [N, 2, ...]: next_obs (state2) + obs (state3).
        # Stacking on axis 1 (not 0) keeps the leading env axis intact so
        # GSPMD sharding needs no resharding collective.
        stk = lambda a, b: jnp.stack([a, b], axis=1)
        sim3 = state3.sim
        if task.enable_phase_obs:
            phase = self.motion.calc_motion_phase(stk(ids, ids3), stk(mt, mt3))
        else:
            phase = jnp.zeros((N, 2), mt.dtype)
        if K:
            tar_rp = stk(aux_cur[:, H:, 0:3], aux3[:, H:, 0:3])
            tar_rr = stk(aux_cur[:, H:, 3:7], aux3[:, H:, 3:7])
            D = self.model.nd
            tar_dp = stk(
                aux_cur[:, H:, 13:13 + D], aux3[:, H:, 13:13 + D]
            )
        else:
            tar_rp = tar_rr = tar_dp = jnp.zeros((N, 2, 0, 0))
        obs2x = obs_mod.compute_add_obs(
            stk(sim.root_pos, sim3.root_pos),
            stk(sim.root_quat, sim3.root_quat),
            stk(sim.root_vel, sim3.root_vel),
            stk(sim.root_ang_vel, sim3.root_ang_vel),
            stk(sim.dof_pos, sim3.dof_pos),
            stk(sim.dof_vel, sim3.dof_vel),
            phase, tar_rp, tar_rr, tar_dp,
            enable_vel_obs=task.enable_vel_obs,
            global_obs=task.global_obs,
            root_height_obs=task.root_height_obs,
            enable_phase_obs=task.enable_phase_obs,
            num_phase_encoding=task.num_phase_encoding,
            enable_tar_obs=task.enable_tar_obs,
        )
        out["next_obs"] = obs2x[:, 0]
        return state3, obs2x[:, 1], aux3, out

    def _push_history(self, state: EnvState) -> EnvState:
        sim = state.sim
        push = lambda buf, x: jnp.concatenate([buf[:, 1:], x[:, None]], axis=1)
        return replace(
            state,
            hist_root_pos=push(state.hist_root_pos, sim.root_pos),
            hist_root_rot=push(state.hist_root_rot, sim.root_quat),
            hist_root_vel=push(state.hist_root_vel, sim.root_vel),
            hist_root_ang_vel=push(state.hist_root_ang_vel, sim.root_ang_vel),
            hist_dof_pos=push(state.hist_dof_pos, sim.dof_pos),
            hist_dof_vel=push(state.hist_dof_vel, sim.dof_vel),
        )

    # ------------------------------------------------------------------- obs

    def compute_obs(self, state: EnvState):
        """Actor/critic obs.  Ref: add_observation.py:231-274."""
        sim = state.sim
        mt = self.motion_times(state)
        t = self.task

        if t.enable_phase_obs:
            phase = self.motion.calc_motion_phase(state.motion_ids, mt)
        else:
            phase = jnp.zeros_like(mt)

        if t.enable_tar_obs:
            steps = jnp.asarray(self.tar_steps)
            times = mt[:, None] + self.ctrl_dt * steps[None, :]
            ids = jnp.broadcast_to(state.motion_ids[:, None], times.shape)
            trp, trr, _, _, tdp, _ = self.motion.get_motion_step(
                ids.reshape(-1), times.reshape(-1)
            )
            K = len(self.tar_steps)
            N = mt.shape[0]
            tar_root_pos = trp.reshape(N, K, 3)
            tar_root_rot = trr.reshape(N, K, 4)
            tar_dof_pos = tdp.reshape(N, K, self.model.nd)
        else:
            tar_root_pos = tar_root_rot = tar_dof_pos = jnp.zeros(
                (mt.shape[0], 0, 0)
            )

        return obs_mod.compute_add_obs(
            sim.root_pos, sim.root_quat, sim.root_vel, sim.root_ang_vel,
            sim.dof_pos, sim.dof_vel, phase,
            tar_root_pos, tar_root_rot, tar_dof_pos,
            enable_vel_obs=t.enable_vel_obs,
            global_obs=t.global_obs,
            root_height_obs=t.root_height_obs,
            enable_phase_obs=t.enable_phase_obs,
            num_phase_encoding=t.num_phase_encoding,
            enable_tar_obs=t.enable_tar_obs,
        )

    def _disc_obs_from_hist(self, state: EnvState):
        return obs_mod.compute_disc_obs(
            state.hist_root_pos, state.hist_root_rot, state.hist_root_vel,
            state.hist_root_ang_vel, state.hist_dof_pos, state.hist_dof_vel,
            enable_vel_obs=self.task.enable_vel_obs,
            global_obs=self.task.global_obs,
        )

    def _demo_window(self, motion_ids, motion_times0):
        """Demo states over the disc history window (oldest->newest).

        Ref: add_observation.py:362-402 (backward time window).
        """
        H = self.task.num_disc_obs_steps
        offs = -self.ctrl_dt * jnp.arange(H - 1, -1, -1, dtype=motion_times0.dtype)
        times = motion_times0[:, None] + offs[None, :]
        ids = jnp.broadcast_to(motion_ids[:, None], times.shape)
        out = self.motion.get_motion_step(ids.reshape(-1), times.reshape(-1))
        N = motion_times0.shape[0]
        return tuple(x.reshape((N, H) + x.shape[1:]) for x in out)

    def _disc_obs_demo(self, motion_ids, motion_times0):
        rp, rr, rv, rav, dp, dv = self._demo_window(motion_ids, motion_times0)
        return obs_mod.compute_disc_obs(
            rp, rr, rv, rav, dp, dv,
            enable_vel_obs=self.task.enable_vel_obs,
            global_obs=self.task.global_obs,
        )

    def fetch_disc_obs_demo(self, key, n: int, sampler_state):
        """Sample demo disc obs (AMP path).  Ref: add_observation.py:158-161."""
        k1, k2 = jax.random.split(key)
        ids = self.motion.sample_motions(k1, n)
        times = self._sample_times(k2, ids, sampler_state)
        return self._disc_obs_demo(ids, times)

    # ----------------------------------------------------------------- reset

    def _sample_times(self, key, motion_ids, sampler_state):
        """Ref: add_motion.py:50-61."""
        if not self.task.rand_reset:
            return jnp.zeros(motion_ids.shape[0])
        return sampler_mod.sample_start_time(
            key, sampler_state, motion_ids, self.seg_sizes, self.ctrl_dt,
            self.min_start_time, self.task.sampler_temperature,
        )

    def reset_where(self, key, state: EnvState, mask, sampler_state):
        """Masked reset: fresh episodes where ``mask`` is True.

        Ref: add_agent.py:221-233 + add_observation.py:308-344 — teleport to
        a sampled reference pose, prefill disc history from demo.
        """
        N = state.time.shape[0]
        k1, k2, k_dr = jax.random.split(key, 3)
        ids = self.motion.sample_motions(k1, N)
        times = self._sample_times(k2, ids, sampler_state)
        dr = (
            sample_dr(k_dr, self.dr, N) if self.dr.enabled
            else init_dr_state(N)
        )

        rp, rr, rv, rav, dp, dv = self.motion.get_motion_step(ids, times)
        hist = self._demo_window(ids, times)

        tgt_lo = jnp.asarray(self.model.dof_limit[:, 0], dp.dtype)
        tgt_hi = jnp.asarray(self.model.dof_limit[:, 1], dp.dtype)
        fresh_sim = SimState(
            root_pos=rp,
            root_quat=rr,
            root_vel=rv,
            root_ang_vel=rav,
            dof_pos=jnp.clip(dp, tgt_lo, tgt_hi),
            dof_vel=dv,
            pd_target=jnp.clip(dp, tgt_lo, tgt_hi),
        )
        fresh = EnvState(
            sim=fresh_sim,
            time=jnp.zeros(N),
            motion_ids=ids,
            motion_offsets=times,
            done=jnp.zeros(N, jnp.int32),
            hist_root_pos=hist[0],
            hist_root_rot=hist[1],
            hist_root_vel=hist[2],
            hist_root_ang_vel=hist[3],
            hist_dof_pos=hist[4],
            hist_dof_vel=hist[5],
            dr=dr,
        )
        pick = lambda new, old: jnp.where(
            mask.reshape((N,) + (1,) * (new.ndim - 1)), new, old
        )
        return jax.tree_util.tree_map(pick, fresh, state)
