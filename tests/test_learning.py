"""Learning-layer tests: TD(λ), normalizers, sampler, distributions."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from add_gym_tpu.envs.done import DoneFlags
from add_gym_tpu.learning import distributions as dist
from add_gym_tpu.learning import normalizer as norm
from add_gym_tpu.learning import sampler as sampler_mod
from add_gym_tpu.learning.add_agent import td_lambda_return


def naive_td_lambda(r, next_vals, done, discount, lam):
    """Direct port of the reference loop (base_agent.py:624-647)."""
    T = r.shape[0]
    out = np.zeros_like(r)
    reset = (done != 0).astype(np.float32)
    out[-1] = r[-1] + discount * next_vals[-1]
    for i in reversed(range(T - 1)):
        curr_lam = lam * (1.0 - reset[i])
        out[i] = r[i] + discount * (
            (1.0 - curr_lam) * next_vals[i] + curr_lam * out[i + 1]
        )
    return out


def test_td_lambda_matches_reference():
    rng = np.random.RandomState(0)
    T, N = 16, 5
    r = rng.randn(T, N).astype(np.float32)
    nv = rng.randn(T, N).astype(np.float32)
    done = (rng.rand(T, N) < 0.15).astype(np.int32) * rng.randint(1, 4, (T, N))
    expect = naive_td_lambda(r, nv, done, 0.99, 0.95)
    got = td_lambda_return(jnp.asarray(r), jnp.asarray(nv), jnp.asarray(done), 0.99, 0.95)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_normalizer_running_stats():
    rng = np.random.RandomState(1)
    state = norm.init_normalizer((3,))
    b1 = rng.randn(100, 3).astype(np.float32) * 2 + 1
    b2 = rng.randn(50, 3).astype(np.float32) * 0.5 - 2
    state = norm.update_normalizer(state, jnp.asarray(b1))
    state = norm.update_normalizer(state, jnp.asarray(b2))
    all_data = np.concatenate([b1, b2])
    np.testing.assert_allclose(state.mean, all_data.mean(0), atol=1e-4)
    np.testing.assert_allclose(state.std, all_data.std(0), atol=1e-3)

    x = jnp.asarray(rng.randn(10, 3), jnp.float32)
    y = norm.normalize(state, x)
    np.testing.assert_allclose(
        norm.unnormalize(state, y), x, atol=1e-4
    )


def test_diff_normalizer():
    rng = np.random.RandomState(2)
    state = norm.init_diff_normalizer((4,))
    b = rng.randn(200, 4).astype(np.float32) * 3
    state = norm.update_diff_normalizer(state, jnp.asarray(b))
    np.testing.assert_allclose(state.mean_abs, np.abs(b).mean(0), atol=1e-3)
    y = norm.diff_normalize(state, jnp.asarray(b[:5]))
    np.testing.assert_allclose(y, b[:5] / np.abs(b).mean(0), atol=1e-4)


def test_sampler_update_and_sampling():
    st = sampler_mod.init_sampler(2, 4)
    seg_sizes = jnp.array([1.0, 2.0])  # clip0: 4s/4, clip1: 8s/4
    clip_ids = jnp.array([0, 0, 1], jnp.int32)
    times = jnp.array([0.5, 1.5, 7.9])     # segs 0, 1 (clip0), 3 (clip1)
    errs = jnp.array([2.0, 4.0, 6.0])
    st = sampler_mod.update_errors(st, seg_sizes, clip_ids, times, errs)
    e = np.asarray(st.errors)
    np.testing.assert_allclose(e[0, 0], 0.9 * 1 + 0.1 * 2.0, atol=1e-5)
    np.testing.assert_allclose(e[0, 1], 0.9 * 1 + 0.1 * 4.0, atol=1e-5)
    np.testing.assert_allclose(e[1, 3], 0.9 * 1 + 0.1 * 6.0, atol=1e-5)
    np.testing.assert_allclose(e[0, 2], 1.0)  # untouched

    t = sampler_mod.sample_start_time(
        jax.random.PRNGKey(0), st, jnp.zeros(64, jnp.int32), seg_sizes,
        0.01, 0.02,
    )
    assert float(t.min()) >= 0.02 - 1e-6
    assert float(t.max()) < 4.0
    q = t / 0.01
    np.testing.assert_allclose(q, jnp.round(q), atol=1e-3)


def test_gaussian_diag_log_prob():
    key = jax.random.PRNGKey(0)
    mean = jax.random.normal(key, (7, 3))
    logstd = jnp.full((7, 3), np.log(0.05))
    x = dist.sample(jax.random.PRNGKey(1), mean, logstd)
    lp = dist.log_prob(mean, logstd, x)
    # compare to scipy-free closed form
    var = 0.05**2
    expect = (
        -0.5 * np.sum((np.asarray(x - mean)) ** 2, -1) / var
        - 0.5 * 3 * np.log(2 * np.pi)
        - 3 * np.log(0.05)
    )
    np.testing.assert_allclose(lp, expect, rtol=1e-4)

    ent = dist.entropy(mean, logstd)
    expect_ent = 3 * (np.log(0.05) + 0.5 * (np.log(2 * np.pi) + 1))
    np.testing.assert_allclose(ent, expect_ent, rtol=1e-5)


def test_pick_shuffle_block():
    """Block-shuffle gate: blocks must be 'B adjacent envs at one
    timestep' (env_count % B == 0) and tile into minibatches exactly."""
    from add_gym_tpu.learning.add_agent import pick_shuffle_block

    # flagship shape: 32 steps x 4096 envs, 8 minibatches of 16384
    assert pick_shuffle_block(131072, 8, 16384, 4096) == 32
    # env counts divisible by 8 but not 32 fall back to 8
    assert pick_shuffle_block(32 * 40, 8, 160, 40) == 8
    # parity_cpu4 (N=4): blocks would straddle timesteps -> per-row
    assert pick_shuffle_block(128, 8, 16, 4) == 1
    # non-tiling minibatch -> per-row
    assert pick_shuffle_block(100, 3, 33, 4096) == 1
    # timestep mode: block = whole timestep when timesteps tile exactly
    assert pick_shuffle_block(131072, 8, 16384, 4096, "timestep") == 4096
    # ...and falls back to auto when they don't (mb not a multiple of N)
    assert pick_shuffle_block(32 * 40, 8, 160, 40, "timestep") == 40
    assert pick_shuffle_block(128, 8, 16, 6, "timestep") == 1


def test_train_iter_smoke():
    """Tiny end-to-end training iteration: finite losses, counters advance."""
    from add_gym_tpu.builder import build_env, build_agent
    from add_gym_tpu.utils.config import load_config

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(4)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(4, bool), ts.sampler)
    obs = env.compute_obs(es)

    ts, es, obs, info = agent.train_iter(ts, es, obs, jax.random.PRNGKey(1))
    for k, v in info.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(ts.sample_count) == 16
    assert float(ts.obs_norm.count) > 0
    # sampler errors changed for visited segments
    assert not np.allclose(np.asarray(ts.sampler.errors), 1.0)


def test_parity_check_mode():
    """debug.parity_check startup sanity (SURVEY §5.2 analog)."""
    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env
    from add_gym_tpu.utils.debug import parity_check

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 4
    cfg["engine"]["fused"] = True
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    env = build_env(cfg)
    parity_check(env)  # raises on divergence


def test_fused_adam_matches_optax():
    """learning/optim.py fused clip+adam == optax chain(clip, adam),
    including the clipping branch and bias correction over many steps."""
    import optax

    from add_gym_tpu.learning.optim import fused_clip_adam

    key = jax.random.PRNGKey(0)
    params = {
        "w": jax.random.normal(key, (16, 8)),
        "b": jnp.zeros((8,)),
        "nested": {"v": jax.random.normal(jax.random.fold_in(key, 1), (8,))},
    }
    ref = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(1e-3, weight_decay=0.0)
    )
    fused = fused_clip_adam(1e-3, clip=1.0)

    p_ref, s_ref = params, ref.init(params)
    p_f, s_f = params, fused.init(params)
    for i in range(10):
        gk = jax.random.fold_in(key, 100 + i)
        # alternate tiny grads (no clip) and huge grads (clip active)
        scale = 1e-3 if i % 2 == 0 else 50.0
        grads = jax.tree_util.tree_map(
            lambda p: scale * jax.random.normal(gk, p.shape), p_ref
        )
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_f, s_f = fused.update(grads, s_f, p_f)
        p_f = optax.apply_updates(p_f, u_f)

    for a, b in zip(
        jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_f)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
