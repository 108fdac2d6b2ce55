"""Golden parity against the reference implementation's own code.

The reference's pure-Python/torch modules (quaternion math, kinematic char
model, motion library, observation/reward jit functions) run on CPU torch,
so we can compare our JAX ports against the *actual reference code* on
identical random inputs — the strongest available check of the
"per-step obs/rewards match the reference" requirement (BASELINE.md).

The reference tree is mounted read-only at /root/reference; skipped if
absent.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "add_gym")), reason="reference not mounted"
)

if os.path.isdir(os.path.join(REF, "add_gym")):
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import add_gym_tpu.mathx.rotations as rot  # noqa: E402


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


def rand_quat(rng, n):
    q = rng.standard_normal((n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(12345)


# ------------------------------------------------------------ quaternion math


def test_quat_math_matches_torch_util(rng):
    torch = _torch()
    from add_gym.util import torch_util

    n = 64
    q0 = rand_quat(rng, n)
    q1 = rand_quat(rng, n)
    v = rng.standard_normal((n, 3)).astype(np.float32)

    tq0, tq1, tv = map(torch.from_numpy, (q0, q1, v))

    checks = [
        (rot.quat_mul(q0, q1), torch_util.quat_mul(tq0, tq1)),
        (rot.quat_rotate(q0, v), torch_util.quat_rotate(tq0, tv)),
        (rot.quat_conjugate(q0), torch_util.quat_conjugate(tq0)),
        (rot.quat_to_tan_norm(q0), torch_util.quat_to_tan_norm(tq0)),
        (
            rot.calc_heading_quat_inv(q0),
            torch_util.calc_heading_quat_inv(tq0),
        ),
        (rot.quat_to_exp_map(q0), torch_util.quat_to_exp_map(tq0)),
        (rot.exp_map_to_quat(v), torch_util.exp_map_to_quat(tv)),
        (
            rot.quat_diff_angle(q0, q1),
            torch_util.quat_diff_angle(tq0, tq1),
        ),
        (
            rot.slerp(q0, q1, jnp.full((n,), 0.3)),
            torch_util.slerp(tq0, tq1, torch.full((n,), 0.3)),
        ),
    ]
    for i, (ours, ref) in enumerate(checks):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), atol=2e-5, err_msg=f"check {i}"
        )


def test_heading_and_twist(rng):
    torch = _torch()
    from add_gym.util import torch_util

    n = 32
    q = rand_quat(rng, n)
    tq = torch.from_numpy(q)
    np.testing.assert_allclose(
        np.asarray(rot.calc_heading(q)),
        torch_util.calc_heading(tq).numpy(),
        atol=2e-5,
    )


# --------------------------------------------------------- kinematic model


@pytest.fixture(scope="module")
def ref_char():
    from add_gym.anim.kin_char_model import KinCharModel

    m = KinCharModel("cpu")
    m.load_char_file(os.path.join(REF, "assets/g1_description/g1_29.xml"))
    return m


@pytest.fixture(scope="module")
def our_char():
    from add_gym_tpu.kinematics.char_model import load_char_model
    from add_gym_tpu.utils.assets import asset_path

    return load_char_model(asset_path("g1_description/g1_29.xml"))


def test_char_model_structure(ref_char, our_char):
    assert ref_char.get_num_joints() == our_char.num_bodies
    assert list(ref_char.get_joint_order()) == our_char.get_joint_order()
    assert ref_char.get_dof_size() == our_char.dof_size
    np.testing.assert_array_equal(
        ref_char._parent_indices.numpy(), our_char.parent_indices
    )


def test_dof_to_rot_matches(ref_char, our_char, rng):
    torch = _torch()
    n = 16
    dof = rng.uniform(-1.0, 1.0, (n, our_char.dof_size)).astype(np.float32)
    ref_rot = ref_char.dof_to_rot(torch.from_numpy(dof)).numpy()
    ours = np.asarray(our_char.dof_to_rot(jnp.asarray(dof)))
    # quaternions may differ by sign
    align = np.where(
        (np.sum(ref_rot * ours, axis=-1) < 0)[..., None], -ours, ours
    )
    np.testing.assert_allclose(align, ref_rot, atol=2e-5)


def test_rot_to_dof_matches(ref_char, our_char, rng):
    torch = _torch()
    n = 16
    dof = rng.uniform(-1.0, 1.0, (n, our_char.dof_size)).astype(np.float32)
    joint_rot = our_char.dof_to_rot(jnp.asarray(dof))
    ref_dof = ref_char.rot_to_dof(torch.from_numpy(np.asarray(joint_rot))).numpy()
    our_dof = np.asarray(our_char.rot_to_dof(joint_rot))
    np.testing.assert_allclose(our_dof, ref_dof, atol=2e-5)
    np.testing.assert_allclose(our_dof, dof, atol=2e-5)


# ------------------------------------------------------------- motion library


def test_motion_lib_tables_match(ref_char, our_char):
    torch = _torch()
    import yaml

    with open(os.path.join(REF, "add_gym/configs/task/pose.yaml")) as f:
        order = yaml.safe_load(f)["motion_joint_order"]

    from add_gym.anim.motion_lib import MotionLib as RefMotionLib
    from add_gym_tpu.motion.motion_lib import load_motion_lib

    clip = os.path.join(REF, "assets/motions/walk1_subject1.motion")
    ref_lib = RefMotionLib(clip, order, ref_char, 0.01, "cpu")
    our_lib = load_motion_lib(clip, order, our_char, dt=0.01)

    times = np.asarray([0.0, 0.317, 1.0, 2.553], np.float32)
    ids_t = torch.zeros(len(times), dtype=torch.long)
    (
        ref_root_pos, ref_root_rot, ref_root_vel, ref_root_ang_vel,
        ref_dof_pos, ref_dof_vel,
    ) = ref_lib.get_precomputed_motion_step(ids_t, torch.from_numpy(times))

    rp, rr, rv, rav, dp, dv = our_lib.get_motion_step(
        jnp.zeros(len(times), jnp.int32), jnp.asarray(times)
    )

    np.testing.assert_allclose(np.asarray(rp), ref_root_pos.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dp), ref_dof_pos.numpy(), atol=5e-4)
    np.testing.assert_allclose(np.asarray(rv), ref_root_vel.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rav), ref_root_ang_vel.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(dv), ref_dof_vel.numpy(), atol=5e-3)
    # quats up to sign
    rr_np = np.asarray(rr)
    ref_rr = ref_root_rot.numpy()
    rr_np = np.where(
        (np.sum(rr_np * ref_rr, -1) < 0)[..., None], -rr_np, rr_np
    )
    np.testing.assert_allclose(rr_np, ref_rr, atol=2e-4)


# ------------------------------------------------------------ obs and reward


@pytest.mark.parametrize("global_obs", [True, False])
@pytest.mark.parametrize("root_height_obs", [True, False])
def test_compute_add_obs_matches(rng, global_obs, root_height_obs):
    torch = _torch()
    from add_gym.learning.add import add_observation as ref_obs
    from add_gym_tpu.envs import obs as our_obs

    n, nd, K = 32, 29, 6
    root_pos = rng.standard_normal((n, 3)).astype(np.float32)
    root_rot = rand_quat(rng, n)
    root_vel = rng.standard_normal((n, 3)).astype(np.float32)
    root_ang = rng.standard_normal((n, 3)).astype(np.float32)
    dof_pos = rng.standard_normal((n, nd)).astype(np.float32)
    dof_vel = rng.standard_normal((n, nd)).astype(np.float32)
    phase = rng.uniform(0, 1, (n,)).astype(np.float32)
    tar_root_pos = rng.standard_normal((n, K, 3)).astype(np.float32)
    tar_root_rot = np.stack([rand_quat(rng, K) for _ in range(n)])
    tar_dof_pos = rng.standard_normal((n, K, nd)).astype(np.float32)

    t = torch.from_numpy
    ref = ref_obs.compute_add_obs(
        t(root_pos), t(root_rot), t(root_vel), t(root_ang), t(dof_pos),
        t(dof_vel), True, global_obs, root_height_obs, t(phase), 4, True,
        True, t(tar_root_pos), t(tar_root_rot), t(tar_dof_pos),
    ).numpy()

    ours = np.asarray(
        our_obs.compute_add_obs(
            jnp.asarray(root_pos), jnp.asarray(root_rot),
            jnp.asarray(root_vel), jnp.asarray(root_ang),
            jnp.asarray(dof_pos), jnp.asarray(dof_vel), jnp.asarray(phase),
            jnp.asarray(tar_root_pos), jnp.asarray(tar_root_rot),
            jnp.asarray(tar_dof_pos),
            enable_vel_obs=True, global_obs=global_obs,
            root_height_obs=root_height_obs, enable_phase_obs=True,
            num_phase_encoding=4, enable_tar_obs=True,
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-5)


@pytest.mark.parametrize("global_obs", [True, False])
def test_compute_disc_obs_matches(rng, global_obs):
    torch = _torch()
    from add_gym.learning.add import add_observation as ref_obs
    from add_gym_tpu.envs import obs as our_obs

    n, H, nd = 16, 3, 29
    root_pos = rng.standard_normal((n, H, 3)).astype(np.float32)
    root_rot = np.stack([rand_quat(rng, H) for _ in range(n)])
    root_vel = rng.standard_normal((n, H, 3)).astype(np.float32)
    root_ang = rng.standard_normal((n, H, 3)).astype(np.float32)
    dof_pos = rng.standard_normal((n, H, nd)).astype(np.float32)
    dof_vel = rng.standard_normal((n, H, nd)).astype(np.float32)

    t = torch.from_numpy
    ref = ref_obs.compute_disc_obs(
        t(root_pos), t(root_rot), t(root_vel), t(root_ang), t(dof_pos),
        t(dof_vel), False, global_obs,
    ).numpy()
    ours = np.asarray(
        our_obs.compute_disc_obs(
            jnp.asarray(root_pos), jnp.asarray(root_rot),
            jnp.asarray(root_vel), jnp.asarray(root_ang),
            jnp.asarray(dof_pos), jnp.asarray(dof_vel),
            enable_vel_obs=False, global_obs=global_obs,
        )
    )
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=3e-5)


@pytest.mark.parametrize("track_root", [True, False])
def test_compute_reward_matches(rng, track_root):
    torch = _torch()
    from add_gym.learning.add import add_reward as ref_reward
    from add_gym_tpu.envs.reward import compute_reward as our_reward

    n, nd = 32, 29
    mk3 = lambda: rng.standard_normal((n, 3)).astype(np.float32)
    mkd = lambda: rng.standard_normal((n, nd)).astype(np.float32)
    args_np = dict(
        root_pos=mk3(), root_rot=rand_quat(rng, n), root_vel=mk3(),
        root_ang_vel=mk3(), dof_pos=mkd(), dof_vel=mkd(),
        tar_root_pos=mk3(), tar_root_rot=rand_quat(rng, n), tar_root_vel=mk3(),
        tar_root_ang_vel=mk3(), tar_dof_pos=mkd(), tar_dof_vel=mkd(),
        dof_err_w=np.ones(nd, np.float32),
    )
    scal = dict(
        track_root_h=True, track_root=track_root, pose_w=0.5, vel_w=0.1,
        root_pose_w=0.15, root_vel_w=0.1, pose_scale=0.25, vel_scale=0.01,
        root_pose_scale=5.0, root_vel_scale=1.0,
    )

    t = torch.from_numpy
    ref = ref_reward.compute_reward(
        *(t(v) for v in args_np.values()), *scal.values()
    ).numpy()
    ours = np.asarray(
        our_reward(*(jnp.asarray(v) for v in args_np.values()), **scal)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)
