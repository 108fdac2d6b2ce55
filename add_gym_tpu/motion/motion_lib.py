"""Motion library: multi-clip mocap store with precomputed per-step tables.

TPU-native counterpart of ``add_gym/anim/motion_lib.py``.  The reference's
key design — precompute every motion step at ctrl-dt resolution into flat
device tensors and serve them by integer gather (motion_lib.py:285-335) — is
already the TPU-friendly layout, so we keep it: lookup is a static-shape
gather usable inside jit/scan.

Loading/precompute happens once on the host; the result is a pytree of
jnp arrays that jitted env functions close over or take as inputs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import yaml

import add_gym_tpu.mathx.rotations as rot
from add_gym_tpu.kinematics.char_model import CharModel
from add_gym_tpu.motion.motion_file import LoopMode, load_motion, extract_pose_data


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class MotionLib:
    """Immutable motion dataset.  All arrays are jnp device arrays.

    Registered as a pytree (dt/dt_inv/num_motions static) so it can be
    passed into jitted functions or device_put directly.
    """

    dt: float = field(metadata=dict(static=True))
    dt_inv: float = field(metadata=dict(static=True))
    num_motions: int = field(metadata=dict(static=True))

    weights: jnp.ndarray        # [M] normalized sampling weights
    lengths: jnp.ndarray        # [M] seconds
    loop_modes: jnp.ndarray     # [M] int (LoopMode)
    num_steps: jnp.ndarray      # [M] steps in the per-dt table
    start_idx: jnp.ndarray      # [M] offset into the flat step tables
    root_pos_delta: jnp.ndarray  # [M, 3] per-loop root displacement (WRAP)

    step_root_pos: jnp.ndarray      # [S, 3]
    step_root_rot: jnp.ndarray      # [S, 4] wxyz
    step_root_vel: jnp.ndarray      # [S, 3]
    step_root_ang_vel: jnp.ndarray  # [S, 3]
    step_dof_pos: jnp.ndarray       # [S, D]
    step_dof_vel: jnp.ndarray       # [S, D]
    # fused lookup tables: the rollout gathers ~20 (id, time) rows per env
    # per step across several call sites; serving all six step fields from
    # ONE [S, 13+2D] row gather (and the per-motion metadata from one
    # [M, 7] gather) collapses ~11 gather ops per lookup into 3 — the
    # rollout is op-count-bound, not bandwidth-bound
    step_all: jnp.ndarray           # [S, 13+2D] = [rp rr rv rav dp dv]
    meta_all: jnp.ndarray           # [M, 7] = [len wrap max_frame start dx dy dz]

    def get_num_motions(self) -> int:
        return self.num_motions

    def get_total_length(self) -> float:
        return float(jnp.sum(self.lengths))

    # --------------------------------------------------------------- lookup

    def get_motion_rows(self, motion_ids, motion_times):
        """Packed precomputed row(s) [..., 13+2D] for (motion_id, time).

        Same lookup semantics as :meth:`get_motion_step` but returns the
        raw packed row ``[rp rr rv rav dp dv]`` with the WRAP loop offset
        already applied to the root position — the cache format carried by
        the rollout's incremental motion-window aux
        (``ImitationEnv.rollout_step_cached``).
        """
        meta = self.meta_all[motion_ids]                  # [..., 7]
        length, wrap_f = meta[..., 0], meta[..., 1]
        max_frame = meta[..., 2]
        wrap = wrap_f != 0.0
        loops = jnp.floor(jnp.maximum(motion_times, 0.0) / length)
        t = jnp.where(wrap, motion_times - loops * length, motion_times)

        # Frame quantization: truncation with a +0.25-frame nudge.  The
        # reference truncates exactly ((motion_times * dt_inv).long(),
        # motion_lib.py:322-324); bare truncation is fragile here because
        # lookup times are dt-grid-aligned by construction (sampling
        # quantizes to dt, episode time advances by dt) and f32
        # accumulation leaves them just BELOW the grid often enough that
        # algebraically-equal time expressions (e.g. (t+dt)+k*dt vs
        # t+(k+1)*dt) truncate to different frames — breaking the bitwise
        # invariant between the fused rollout's incremental row cache and
        # fresh gathers.  The nudge absorbs grid noise (measured worst
        # case over a 20 s f32 accumulation: 0.046 frames — 5x margin)
        # while preserving the reference's truncation for any genuinely
        # off-grid time with fractional frame <= 0.75, which covers
        # WRAP-clip wrapped times (30 fps / dt=0.01 gives fractional
        # parts of exactly {0, 1/3, 2/3}).  Pinned by
        # tests/test_env.py::test_rollout_step_cached_aux_invariant and
        # test_reference_parity.py::test_motion_lib_tables_match.
        frame = jnp.floor(t * self.dt_inv + 0.25)
        frame = jnp.clip(frame, 0.0, max_frame)
        idx = (frame + meta[..., 3]).astype(jnp.int32)

        offset = jnp.where(
            wrap[..., None], loops[..., None] * meta[..., 4:7], 0.0
        )
        row = self.step_all[idx]                          # [..., 13+2D]
        return row.at[..., 0:3].add(offset)

    @staticmethod
    def split_rows(row):
        """Packed row [..., 13+2D] -> (rp, rr, rv, rav, dp, dv)."""
        D = (row.shape[-1] - 13) // 2
        return (
            row[..., 0:3],
            row[..., 3:7],
            row[..., 7:10],
            row[..., 10:13],
            row[..., 13:13 + D],
            row[..., 13 + D:13 + 2 * D],
        )

    def get_motion_step(self, motion_ids, motion_times):
        """Gather the precomputed step for (motion_id, time).

        Ref: motion_lib.py:322-335.  Unlike the reference we clamp the frame
        index *per motion* (the reference clamps against the whole flat table,
        which can read one frame into the next clip at episode end).

        WRAP clips loop: time wraps modulo the clip length and the root
        position accumulates the per-loop displacement
        (ref: motion_lib.py:133-150 ``_calc_loop_offset``).

        ``motion_ids``/``motion_times`` may have any (matching) shape; the
        returned fields carry that shape plus the field's trailing dims.
        Three gathers total: metadata [M, 7], step rows [S, 13+2D], slice.
        """
        return self.split_rows(self.get_motion_rows(motion_ids, motion_times))

    def calc_motion_phase(self, motion_ids, times):
        """Ref: motion_lib.py:361-372."""
        motion_len = self.lengths[motion_ids]
        phase = times / motion_len
        wrapped = phase - jnp.floor(phase)
        phase = jnp.where(
            self.loop_modes[motion_ids] == int(LoopMode.WRAP), wrapped, phase
        )
        return jnp.clip(phase, 0.0, 1.0)

    def get_motion_length(self, motion_ids):
        return self.lengths[motion_ids]

    def get_motion_loop_mode(self, motion_ids):
        return self.loop_modes[motion_ids]

    # ------------------------------------------------------------- sampling

    def sample_motions(self, key, n: int):
        """Weighted clip sampling.  Ref: motion_lib.py:35-39."""
        return jax.random.choice(
            key, self.num_motions, shape=(n,), replace=True, p=self.weights
        )

    def sample_time(self, key, motion_ids):
        """Uniform time in [0, len), quantized to dt.  Ref: motion_lib.py:41-47."""
        phase = jax.random.uniform(key, motion_ids.shape)
        t = phase * self.lengths[motion_ids]
        return jnp.floor(t / self.dt) * self.dt


# ------------------------------------------------------------------ loading


def _fetch_motion_files(motion_file: str):
    """Single file or YAML manifest of {file, weight}.  Ref: motion_lib.py:337-358.

    Manifest entries resolve through the asset root (so manifests can live
    in the repo while clips live with the assets).
    """
    if motion_file.endswith(".yaml"):
        from add_gym_tpu.utils.assets import asset_path

        with open(motion_file) as f:
            cfg = yaml.safe_load(f)
        files = [asset_path(m["file"]) for m in cfg["motions"]]
        weights = [float(m["weight"]) for m in cfg["motions"]]
        assert all(w >= 0 for w in weights)
        return files, weights
    return [motion_file], [1.0]


def _interp_frames(char: CharModel, root_pos, root_rot, joint_rot, times, length):
    """Interpolate per-source-frame data at the given times (CLAMP phase).

    Ref: motion_lib.py:61-88,118-131 — lerp root pos, slerp root and joint
    rots, then convert interpolated joint rots back to dof angles.
    """
    num_frames = root_pos.shape[0]
    phase = jnp.clip(times / length, 0.0, 1.0)
    fidx = phase * (num_frames - 1)
    idx0 = jnp.floor(fidx).astype(jnp.int32)
    idx1 = jnp.minimum(idx0 + 1, num_frames - 1)
    blend = fidx - idx0

    rp = (1.0 - blend[:, None]) * root_pos[idx0] + blend[:, None] * root_pos[idx1]
    rr = rot.slerp(root_rot[idx0], root_rot[idx1], blend)
    jr = rot.slerp(joint_rot[idx0], joint_rot[idx1], blend[:, None])
    dof = char.rot_to_dof(jr)
    return rp, rr, jr, dof, idx0


def load_motion_lib(
    motion_file: str,
    motion_order: Sequence[str],
    char: CharModel,
    dt: float,
) -> MotionLib:
    """Load clips, reorder joints to the BFS client order, precompute tables.

    Ref: motion_lib.py:152-335.
    """
    files, weights = _fetch_motion_files(motion_file)
    kin_order = char.get_joint_order()[1:]
    col_map = np.asarray([list(motion_order).index(n) for n in kin_order], np.int32)

    # Precompute on host CPU: eager small ops through a TPU tunnel are far
    # slower than the copy of the final tables to device afterwards.
    # local_devices, NOT jax.devices(): under multi-process jax.distributed
    # the global list can lead with another process's (non-addressable)
    # device, and computing onto it deadlocks/fails (tests/test_distributed).
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.local_devices()[0]
    with jax.default_device(cpu):
        lib = _load_on_host(files, weights, col_map, char, dt)
    return jax.device_put(lib, jax.local_devices()[0])


def _load_on_host(files, weights, col_map, char, dt) -> MotionLib:

    lengths: List[float] = []
    loop_modes: List[int] = []
    tables = {k: [] for k in ("rp", "rr", "rv", "rav", "dp", "dv")}
    num_steps: List[int] = []
    root_pos_delta: List[np.ndarray] = []

    for path in files:
        clip = load_motion(path)
        fps = float(clip.fps)
        frames = np.asarray(clip.frames, np.float64)
        root_pos_np, root_rot_np, joint_dof_np = extract_pose_data(frames)
        joint_dof_np = joint_dof_np[:, col_map]

        root_pos = jnp.asarray(root_pos_np, jnp.float32)
        root_rot = rot.quat_normalize(jnp.asarray(root_rot_np, jnp.float32))
        joint_dof = jnp.asarray(joint_dof_np, jnp.float32)
        joint_rot = rot.quat_pos(char.dof_to_rot(joint_dof))

        length = float(frames.shape[0] - 1) / fps

        # per-source-frame velocities (finite differences, last repeated)
        # ref: motion_lib.py:210-221
        root_vel = fps * (root_pos[1:] - root_pos[:-1])
        root_vel = jnp.concatenate([root_vel, root_vel[-1:]], axis=0)
        drot = rot.quat_diff(root_rot[:-1], root_rot[1:])
        root_ang_vel = fps * rot.quat_to_exp_map(drot)
        root_ang_vel = jnp.concatenate([root_ang_vel, root_ang_vel[-1:]], axis=0)
        dof_vel = char.compute_frame_dof_vel(joint_rot, 1.0 / fps)

        # precompute at ctrl-dt resolution (ref: motion_lib.py:285-320)
        times = jnp.asarray(np.arange(0.0, length, dt), jnp.float32)
        rp, rr, _, dp, idx0 = _interp_frames(
            char, root_pos, root_rot, joint_rot, times, length
        )
        tables["rp"].append(rp)
        tables["rr"].append(rr)
        tables["rv"].append(root_vel[idx0])
        tables["rav"].append(root_ang_vel[idx0])
        tables["dp"].append(dp)
        tables["dv"].append(dof_vel[idx0])

        lengths.append(length)
        loop_modes.append(int(clip.loop_mode))
        num_steps.append(int(times.shape[0]))
        root_pos_delta.append(
            np.asarray(root_pos[-1] - root_pos[0], np.float32)
        )

    w = np.asarray(weights, np.float32)
    w = w / w.sum()
    num_steps_arr = np.asarray(num_steps, np.int32)
    start_idx = np.concatenate([[0], np.cumsum(num_steps_arr)[:-1]]).astype(np.int32)

    step_all = jnp.concatenate(
        [jnp.concatenate(tables[k]) for k in ("rp", "rr", "rv", "rav", "dp", "dv")],
        axis=-1,
    )
    meta_all = jnp.asarray(
        np.column_stack(
            [
                np.asarray(lengths, np.float32),
                (np.asarray(loop_modes) == int(LoopMode.WRAP)).astype(np.float32),
                (num_steps_arr - 1).astype(np.float32),
                start_idx.astype(np.float32),
                np.stack(root_pos_delta),
            ]
        )
    )

    return MotionLib(
        dt=dt,
        dt_inv=round(1.0 / dt),
        num_motions=len(files),
        weights=jnp.asarray(w),
        lengths=jnp.asarray(lengths, jnp.float32),
        loop_modes=jnp.asarray(loop_modes, jnp.int32),
        num_steps=jnp.asarray(num_steps_arr),
        start_idx=jnp.asarray(start_idx),
        root_pos_delta=jnp.asarray(np.stack(root_pos_delta)),
        step_root_pos=jnp.concatenate(tables["rp"]),
        step_root_rot=jnp.concatenate(tables["rr"]),
        step_root_vel=jnp.concatenate(tables["rv"]),
        step_root_ang_vel=jnp.concatenate(tables["rav"]),
        step_dof_pos=jnp.concatenate(tables["dp"]),
        step_dof_vel=jnp.concatenate(tables["dv"]),
        step_all=step_all,
        meta_all=meta_all,
    )
