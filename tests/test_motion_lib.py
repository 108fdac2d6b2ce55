"""MotionLib tests on a real mocap clip plus synthetic fixtures."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from add_gym_tpu.kinematics.char_model import load_char_model
from add_gym_tpu.motion.motion_lib import load_motion_lib
from add_gym_tpu.motion.motion_file import load_motion, extract_pose_data
from add_gym_tpu.utils.assets import asset_path

CLIP = "motions/walk1_subject1.motion"


@pytest.fixture(scope="module")
def char():
    return load_char_model(asset_path("g1_description/g1_29.xml"))


@pytest.fixture(scope="module")
def motion_order():
    with open("/root/reference/add_gym/configs/task/pose.yaml") as f:
        return yaml.safe_load(f)["motion_joint_order"]


@pytest.fixture(scope="module")
def lib(char, motion_order):
    return load_motion_lib(asset_path(CLIP), motion_order, char, dt=0.01)


def test_clip_metadata(lib):
    clip = load_motion(asset_path(CLIP))
    expect_len = (clip.frames.shape[0] - 1) / 30.0
    assert lib.num_motions == 1
    np.testing.assert_allclose(float(lib.lengths[0]), expect_len, rtol=1e-5)
    # per-dt table covers [0, len) at 100 Hz
    assert int(lib.num_steps[0]) == int(np.ceil(expect_len / 0.01)) or int(
        lib.num_steps[0]
    ) == len(np.arange(0, expect_len, 0.01))


def test_frame_zero_matches_source(lib, char, motion_order):
    clip = load_motion(asset_path(CLIP))
    root_pos, root_rot, joint_dof = extract_pose_data(clip.frames[0])

    rp, rr, rv, rav, dp, dv = lib.get_motion_step(
        jnp.zeros(1, jnp.int32), jnp.zeros(1)
    )
    np.testing.assert_allclose(np.asarray(rp[0]), root_pos, atol=1e-4)
    # root quat normalized wxyz, same hemisphere up to sign
    dot = abs(float(np.sum(np.asarray(rr[0]) * root_rot / np.linalg.norm(root_rot))))
    assert dot > 1 - 1e-4

    # dof columns reordered from motion order to BFS client order; hinge
    # round trip through quats preserves the angle
    kin_order = char.get_joint_order()[1:]
    col_map = [list(motion_order).index(n) for n in kin_order]
    np.testing.assert_allclose(np.asarray(dp[0]), joint_dof[col_map], atol=1e-3)


def test_time_quantization_gather(lib):
    # frame = floor(t*dt_inv + 0.25): truncation with a quarter-frame
    # nudge (motion_lib.get_motion_rows).  Times with fractional frame
    # < 0.75 resolve to step k (the reference's truncation); the nudge
    # only absorbs f32 grid noise around dt-aligned times.
    ids = jnp.zeros(3, jnp.int32)
    base = lib.get_motion_step(ids, jnp.array([0.50, 0.504, 0.507]))
    for arr in base:
        np.testing.assert_allclose(arr[0], arr[1], atol=0)
        np.testing.assert_allclose(arr[0], arr[2], atol=0)
    # a dt-aligned time computed slightly BELOW the grid (the f32
    # accumulation case) still lands on its intended frame
    lo = jnp.float32(0.51) - jnp.float32(2e-4)
    a = lib.get_motion_step(ids[:1], jnp.array([0.51]))
    b = lib.get_motion_step(ids[:1], lo[None])
    np.testing.assert_allclose(a[0], b[0], atol=0)


def test_clamp_beyond_end(lib):
    ids = jnp.zeros(2, jnp.int32)
    end = lib.get_motion_step(ids, jnp.array([1e6, float(lib.lengths[0])]))
    last = lib.get_motion_step(
        ids, jnp.full((2,), float(lib.lengths[0]) - 0.005)
    )
    np.testing.assert_allclose(end[0][0], end[0][1], atol=0)
    # clamped to final step, close to the last in-range step
    assert float(jnp.linalg.norm(end[0][0] - last[0][0])) < 0.05


def test_phase_clamp(lib):
    ids = jnp.zeros(3, jnp.int32)
    L = float(lib.lengths[0])
    phase = lib.calc_motion_phase(ids, jnp.array([0.0, 0.5 * L, 2.0 * L]))
    np.testing.assert_allclose(phase, [0.0, 0.5, 1.0], atol=1e-5)


def test_sampling(lib):
    key = jax.random.PRNGKey(0)
    ids = lib.sample_motions(key, 64)
    assert ids.shape == (64,)
    assert int(ids.max()) == 0

    times = lib.sample_time(jax.random.PRNGKey(1), ids)
    assert float(times.min()) >= 0
    assert float(times.max()) < float(lib.lengths[0])
    # quantized to dt
    q = times / 0.01
    np.testing.assert_allclose(q, jnp.round(q), atol=1e-3)


def test_velocity_consistency(lib):
    # finite difference of precomputed root positions ~ stored root velocity
    ids = jnp.zeros(1, jnp.int32)
    t = jnp.array([1.0])
    rp0, _, rv0, _, dp0, dv0 = lib.get_motion_step(ids, t)
    rp1, _, _, _, dp1, _ = lib.get_motion_step(ids, t + 1.0 / 30.0)
    est = (rp1 - rp0) * 30.0
    np.testing.assert_allclose(est, rv0, atol=0.25)
    est_dof = (dp1 - dp0) * 30.0
    # dof velocities are per-source-frame finite differences; tolerate noise
    assert float(jnp.mean(jnp.abs(est_dof - dv0))) < 0.5


def test_gather_jits_in_scan(lib):
    # the lookup must work inside lax.scan (the rollout hot loop)
    def body(carry, t):
        out = lib.get_motion_step(jnp.zeros(4, jnp.int32), jnp.full(4, t))
        return carry, out[0]

    _, traj = jax.jit(lambda: jax.lax.scan(body, 0, jnp.arange(0.0, 1.0, 0.1)))()
    assert traj.shape == (10, 4, 3)


def test_wrap_loop_mode(char, motion_order, tmp_path):
    """WRAP clips wrap time and accumulate the per-loop root displacement
    (ref: motion_lib.py:133-150 _calc_loop_offset)."""
    from add_gym_tpu.motion.motion_file import LoopMode, MotionClip

    clip = load_motion(asset_path(CLIP))
    wrapped = MotionClip(loop_mode=LoopMode.WRAP, fps=clip.fps, frames=clip.frames)
    p = tmp_path / "wrap.pkl"
    wrapped.save(str(p))
    lib = load_motion_lib(str(p), motion_order, char, dt=0.01)

    length = float(lib.lengths[0])
    ids = jnp.zeros(3, jnp.int32)
    t_in = jnp.array([0.5, 0.5 + length, 0.5 + 2 * length])
    rp, rr, _, _, dp, _ = lib.get_motion_step(ids, t_in)

    delta = np.asarray(lib.root_pos_delta[0])
    # same wrapped frame -> same pose, offset root position
    np.testing.assert_allclose(np.asarray(rr[1]), np.asarray(rr[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dp[2]), np.asarray(dp[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rp[1] - rp[0]), delta, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rp[2] - rp[0]), 2 * delta, atol=1e-5)

    # phase wraps
    ph = lib.calc_motion_phase(ids, t_in)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(ph[0]).repeat(3), atol=1e-4)
