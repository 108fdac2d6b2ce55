"""Per-iteration trainer parity against the reference's actual torch code.

The reference's training-iteration math — TD(λ) returns
(base_agent.py:624-647), succ/fail bootstrap (base_agent.py:472-480),
advantage build (ppo_agent.py:111-158), PPO/critic/bound losses
(ppo_agent.py:194-275, base_agent.py:522-546), and the ADD/AMP
discriminator losses (add/add_agent.py:141-202, amp_agent.py:98-175) —
all runs on CPU torch.  We record one real rollout trajectory from OUR
stack, copy OUR network weights into the reference's own ADDModel, feed
the trajectory through the reference's functions, and assert our
``build_train_data`` and ``_loss`` reproduce returns, advantages, and
every loss term to f32 tolerance.  This is the last rung of the BASELINE
"per-step parity" ladder reachable without CUDA.
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "add_gym")), reason="reference not mounted"
)

if os.path.isdir(os.path.join(REF, "add_gym")):
    sys.path.insert(0, REF)
    # the reference's add_agent module transitively imports hydra (via
    # envs.env) and torchvision (TB sampler images) — neither is installed
    # here nor touched by the loss/return functions under test.  Stub just
    # enough for the imports to resolve.
    import types

    def _stub(name, **attrs):
        if name in sys.modules:
            return
        try:
            __import__(name)
            return
        except ImportError:
            pass
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    # add_gym.envs.env drags in the GPU engine backends (genesis/warp) at
    # import time; the loss/return functions under test never touch it
    _stub("add_gym.envs.env", ImitationEnvironment=object, Environment=object)
    _stub("add_gym.envs", env=sys.modules.get("add_gym.envs.env"))

    if "hydra" not in sys.modules:
        try:
            import hydra  # noqa: F401
        except ImportError:
            hydra = types.ModuleType("hydra")
            hydra.utils = types.ModuleType("hydra.utils")
            hydra.utils.instantiate = lambda *a, **k: None
            sys.modules["hydra"] = hydra
            sys.modules["hydra.utils"] = hydra.utils
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tvf = types.ModuleType("torchvision.transforms.functional")
            tvf.to_tensor = lambda *a, **k: None
            tvt = types.ModuleType("torchvision.transforms")
            tvt.functional = tvf
            tv.transforms = tvt
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tvt
            sys.modules["torchvision.transforms.functional"] = tvf

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from add_gym_tpu.builder import build_agent, build_env  # noqa: E402
from add_gym_tpu.utils.config import load_config  # noqa: E402

T, N = 8, 4


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


@pytest.fixture(scope="module")
def stack():
    """Our env+agent (pure f32, exp_prob<1 so the rand mask is nontrivial)
    plus one recorded rollout trajectory and its train data."""
    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    cfg["engine"]["pallas"] = "off"
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    a = cfg["agent"]
    a["steps_per_iter"] = T
    a["mixed_precision"] = False
    a["disc_mixed_precision"] = False
    a["exp_prob"] = 0.7
    env = build_env(cfg)
    agent = build_agent(cfg, env)

    ts = agent.init_train_state()
    es = env.init_state(N)
    es = env.reset_where(jax.random.PRNGKey(0), es, jnp.ones(N, bool), ts.sampler)
    obs = env.compute_obs(es)
    # a couple of warmup iterations so normalizer stats / disc weights are
    # nontrivial when we compare
    for k in range(2):
        ts, es, obs, _ = agent.train_iter(ts, es, obs, jax.random.PRNGKey(1 + k))
    _, _, traj = agent.rollout(ts, es, obs, jax.random.PRNGKey(7), T, train=True)
    traj = jax.tree_util.tree_map(np.asarray, traj)
    ts2, data, info = agent.build_train_data(ts, traj)
    data = {
        k: np.asarray(v) for k, v in data.items() if hasattr(v, "shape")
    }
    return dict(agent=agent, ts=ts, traj=traj, data=data, info=info)


def _copy_linears(torch, tree, linears):
    for i, lin in enumerate(linears):
        k = tree[f"Dense_{i}"]
        lin.weight.data = torch.from_numpy(np.asarray(k["kernel"]).T.copy())
        lin.bias.data = torch.from_numpy(np.asarray(k["bias"]).copy())


def _build_ref_model(torch, agent, obs_dim, disc_dim):
    """The reference's own ADDModel carrying OUR weights."""
    from add_gym.learning.add.add_model import ADDModel

    cfg = dict(
        actor_net=agent.cfg.actor_net,
        critic_net=agent.cfg.critic_net,
        disc_net=agent.cfg.disc_net,
        actor_init_output_scale=agent.cfg.actor_init_output_scale,
        actor_std_type="FIXED",
        action_std=agent.cfg.action_std,
    )
    A = agent.env.num_dofs
    a_space = torch.stack(
        [
            torch.from_numpy(np.asarray(agent.env.action_low)),
            torch.from_numpy(np.asarray(agent.env.action_high)),
        ],
        dim=-1,
    )  # [A, 2], dtype float (BaseModel._build_action_distribution contract)
    model = ADDModel(cfg, None, [obs_dim], a_space, [disc_dim])
    return model, a_space


def _load_weights(torch, model, params):
    p = params["params"]

    def linears(seq):
        return [m for m in seq if isinstance(m, torch.nn.Linear)]

    _copy_linears(torch, p["actor_trunk"], linears(model._actor_layers))
    _copy_linears(torch, p["critic_trunk"], linears(model._critic_layers))
    _copy_linears(torch, p["disc_trunk"], linears(model._disc_layers))
    for head, name in (
        (model._action_dist._mean_net, "actor_mean"),
        (model._critic_out, "critic_out"),
        (model._disc_logits, "disc_logit"),
    ):
        head.weight.data = torch.from_numpy(np.asarray(p[name]["kernel"]).T.copy())
        head.bias.data = torch.from_numpy(np.asarray(p[name]["bias"]).copy())


def _ref_normalizers(torch, ts):
    from add_gym.learning.diff_normalizer import DiffNormalizer
    from add_gym.learning.normalizer import Normalizer

    obs_norm = Normalizer(
        tuple(np.asarray(ts.obs_norm.mean).shape), device="cpu"
    )
    obs_norm._mean.data = torch.from_numpy(np.asarray(ts.obs_norm.mean).copy())
    obs_norm._std.data = torch.from_numpy(np.asarray(ts.obs_norm.std).copy())
    disc_norm = DiffNormalizer(
        tuple(np.asarray(ts.disc_norm.mean_abs).shape), device="cpu"
    )
    disc_norm._mean_abs.data = torch.from_numpy(
        np.asarray(ts.disc_norm.mean_abs).copy()
    )
    return obs_norm, disc_norm


def test_td_lambda_through_reference_code():
    """Our td_lambda_return vs the reference's compute_td_lambda_return on
    random inputs (the reference function itself, not a port of it)."""
    torch = _torch()
    from add_gym.learning.base_agent import compute_td_lambda_return

    from add_gym_tpu.learning.add_agent import td_lambda_return

    rng = np.random.default_rng(3)
    r = rng.standard_normal((16, 6)).astype(np.float32)
    nv = rng.standard_normal((16, 6)).astype(np.float32)
    done = (rng.random((16, 6)) < 0.2) * rng.integers(1, 4, (16, 6))
    done = done.astype(np.int64)

    expect = compute_td_lambda_return(
        torch.from_numpy(r), torch.from_numpy(nv), torch.from_numpy(done),
        0.99, 0.95,
    ).numpy()
    got = td_lambda_return(
        jnp.asarray(r), jnp.asarray(nv), jnp.asarray(done), 0.99, 0.95
    )
    np.testing.assert_allclose(np.asarray(got), expect, atol=1e-5)


def test_build_train_data_matches_reference(stack):
    """Returns + normalized advantages from our recorded trajectory match
    the reference's _build_train_data pipeline (ppo_agent.py:111-158) run
    on CPU torch with our weights in the reference's own model."""
    torch = _torch()
    from add_gym.learning.base_agent import DoneFlags, compute_td_lambda_return

    agent, ts, traj, data = (
        stack["agent"], stack["ts"], stack["traj"], stack["data"],
    )
    obs_dim = agent.env.obs_dim()
    disc_dim = agent.env.disc_obs_dim()
    model, _ = _build_ref_model(torch, agent, obs_dim, disc_dim)
    _load_weights(torch, model, ts.params)
    obs_norm, disc_norm = _ref_normalizers(torch, ts)

    tt = lambda x: torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        # disc reward on normalized obs differences (add_agent.py:135-139,
        # amp_agent.py:194-206)
        diff = tt(traj["disc_obs_demo"]) - tt(traj["disc_obs"])
        norm_diff = disc_norm.normalize(diff)
        logits = model.eval_disc(norm_diff).squeeze(-1)
        prob = 1.0 / (1.0 + torch.exp(-logits))
        disc_r = -torch.log(torch.clamp_min(1.0 - prob, 1e-4))
        disc_r = disc_r * agent.cfg.disc_reward_scale
        r = (
            agent.cfg.task_reward_weight * tt(traj["reward"])
            + agent.cfg.disc_reward_weight * disc_r
        )

        # critic targets with succ/fail bootstrap (base_agent.py:472-480;
        # ImitationEnvironment's succ/fail rewards are 0 -> r/(1-γ) = 0)
        next_vals = model.eval_critic(
            obs_norm.normalize(tt(traj["next_obs"]))
        ).squeeze(-1)
        done = torch.from_numpy(np.asarray(traj["done"], np.int64))
        next_vals[done == DoneFlags.SUCC.value] = 0.0
        next_vals[done == DoneFlags.FAIL.value] = 0.0
        rets = compute_td_lambda_return(
            r, next_vals, done, agent.cfg.discount, agent.cfg.td_lambda
        )
        vals = model.eval_critic(
            obs_norm.normalize(tt(traj["obs"]))
        ).squeeze(-1)
        adv = rets - vals

        mask = tt(traj["rand_mask"]).flatten() == 1.0
        assert bool(mask.any()) and not bool(mask.all()), (
            "rand mask should be nontrivial at exp_prob=0.7"
        )
        adv_std, adv_mean = torch.std_mean(adv.flatten()[mask], dim=0)
        norm_adv = (adv - adv_mean) / torch.clamp_min(adv_std, 1e-5)
        norm_adv = torch.clamp(
            norm_adv, -agent.cfg.norm_adv_clip, agent.cfg.norm_adv_clip
        )

    np.testing.assert_allclose(data["reward"], r.numpy(), atol=2e-4)
    np.testing.assert_allclose(data["tar_val"], rets.numpy(), atol=3e-4)
    np.testing.assert_allclose(data["adv"], norm_adv.numpy(), atol=3e-4)
    np.testing.assert_allclose(
        float(stack["info"]["adv_mean"]), float(adv_mean), atol=2e-4
    )
    np.testing.assert_allclose(
        float(stack["info"]["adv_std"]), float(adv_std), atol=2e-4
    )


def test_loss_terms_match_reference(stack):
    """Every loss term on one minibatch matches the reference's
    _compute_critic_loss/_compute_actor_loss (ppo_agent.py:194-275), the
    action bound loss (base_agent.py:522-546), and ADD's
    _compute_disc_loss (add/add_agent.py:141-202) — the reference methods
    themselves, invoked on a stub agent carrying our weights."""
    torch = _torch()
    import add_gym.learning.add.add_agent as ref_add
    import add_gym.learning.ppo_agent as ref_ppo

    agent, ts, traj, data = (
        stack["agent"], stack["ts"], stack["traj"], stack["data"],
    )
    obs_dim = agent.env.obs_dim()
    disc_dim = agent.env.disc_obs_dim()
    model, a_space = _build_ref_model(torch, agent, obs_dim, disc_dim)
    _load_weights(torch, model, ts.params)
    obs_norm, disc_norm = _ref_normalizers(torch, ts)

    # stub reference ADDAgent: the loss methods only touch these attributes
    # (BaseAgent subclasses nn.Module, so Module state must exist before
    # attribute assignment)
    ref = object.__new__(ref_add.ADDAgent)
    torch.nn.Module.__init__(ref)
    ref.model = model
    ref._obs_norm = obs_norm
    ref._disc_obs_norm = disc_norm
    ref._pos_diff = torch.zeros(disc_dim)
    ref._env = SimpleNamespace(
        robot=SimpleNamespace(get_action_space=lambda: a_space)
    )
    ref._ppo_clip_ratio = agent.cfg.ppo_clip_ratio
    ref._action_bound_weight = agent.cfg.action_bound_weight
    ref._action_entropy_weight = agent.cfg.action_entropy_weight
    ref._action_reg_weight = agent.cfg.action_reg_weight
    ref._critic_loss_weight = agent.cfg.critic_loss_weight
    ref._disc_logit_reg = agent.cfg.disc_logit_reg
    ref._disc_grad_penalty = agent.cfg.disc_grad_penalty
    ref._disc_weight_decay = agent.cfg.disc_weight_decay

    M = T * N
    flatten = lambda x: np.asarray(x).reshape((M,) + np.asarray(x).shape[2:])
    tt = lambda x: torch.from_numpy(flatten(x).astype(np.float32))

    batch = {
        "obs": tt(traj["obs"]),
        "action": tt(traj["action"]),
        "a_logp": tt(traj["a_logp"]),
        "tar_val": tt(data["tar_val"]),
        "adv": tt(data["adv"]),
        "rand_action_mask": tt(traj["rand_mask"]),
        "disc_obs": tt(traj["disc_obs"]),
        "disc_obs_demo": tt(traj["disc_obs_demo"]),
    }
    batch["norm_obs"] = obs_norm.normalize(batch["obs"])
    # reference _a_norm: affine (a - mid) / halfrange (base_agent.py:233-266)
    a_mean = torch.from_numpy(np.asarray(agent.a_mean))
    a_std = torch.from_numpy(np.asarray(agent.a_std))
    batch["norm_action"] = (batch["action"] - a_mean) / a_std

    critic_info = ref_ppo.PPOAgent._compute_critic_loss(ref, batch)
    actor_info = ref_ppo.PPOAgent._compute_actor_loss(ref, batch)
    disc_info = ref_add.ADDAgent._compute_disc_loss(ref, batch)
    ref_actor_total = actor_info["actor_loss"]
    ref_total = (
        ref_actor_total
        + agent.cfg.critic_loss_weight * critic_info["critic_loss"]
        + agent.cfg.disc_loss_weight * disc_info["disc_loss"]
    )

    # our loss on the identical (full-buffer) minibatch
    our_batch = {
        "norm_obs": jnp.asarray(flatten(data["norm_obs"])),
        "norm_a": jnp.asarray(flatten(data["norm_a"])),
        "a_logp": jnp.asarray(flatten(traj["a_logp"])),
        "tar_val": jnp.asarray(flatten(data["tar_val"])),
        "adv": jnp.asarray(flatten(data["adv"])),
        "rand_mask": jnp.asarray(flatten(traj["rand_mask"])),
        "disc_in": jnp.asarray(flatten(data["disc_in"])),
    }
    loss, info = agent._loss(ts.params, our_batch)

    pairs = [
        (info["critic_loss"], critic_info["critic_loss"], 3e-4),
        (info["actor_loss"], actor_info["actor_loss"], 3e-4),
        (info["clip_frac"], actor_info["clip_frac"], 1e-6),
        (info["imp_ratio"], actor_info["imp_ratio"], 1e-4),
        (info["disc_loss"], disc_info["disc_loss"], 3e-4),
        (info["disc_grad_penalty"], disc_info["disc_grad_penalty"], 3e-4),
        (info["disc_pos_logit"], disc_info["disc_pos_logit"], 2e-4),
        (info["disc_neg_logit"], disc_info["disc_neg_logit"], 2e-4),
        (info["disc_pos_acc"], disc_info["disc_pos_acc"], 1e-6),
        (info["disc_neg_acc"], disc_info["disc_neg_acc"], 1e-6),
        (loss, ref_total, 5e-4),
    ]
    for ours, theirs, tol in pairs:
        np.testing.assert_allclose(
            float(ours), float(theirs.detach()), atol=tol, rtol=1e-4
        )


def test_amp_grad_penalty_matches_reference(stack):
    """AMP's grad penalty is the zero-centered mean squared gradient on the
    demo input (amp_agent.py:131-142) — a different form from ADD's
    (|grad|-1)^2.  Pin our amp branch against the reference method."""
    torch = _torch()
    import add_gym.learning.amp_agent as ref_amp

    agent, ts = stack["agent"], stack["ts"]
    disc_dim = agent.env.disc_obs_dim()
    model, a_space = _build_ref_model(
        torch, agent, agent.env.obs_dim(), disc_dim
    )
    _load_weights(torch, model, ts.params)

    rng = np.random.default_rng(11)
    pos = rng.standard_normal((T * N, disc_dim)).astype(np.float32)
    neg = rng.standard_normal((T * N, disc_dim)).astype(np.float32)

    ref = object.__new__(ref_amp.AMPAgent)
    torch.nn.Module.__init__(ref)
    ref.model = model
    ref._disc_logit_reg = agent.cfg.disc_logit_reg
    ref._disc_grad_penalty = agent.cfg.disc_grad_penalty
    ref._disc_weight_decay = agent.cfg.disc_weight_decay
    batch = {
        "norm_disc_obs": torch.from_numpy(neg.copy()),
        "norm_disc_obs_demo": torch.from_numpy(pos.copy()),
    }
    disc_info = ref_amp.AMPAgent._compute_disc_loss(ref, batch)

    # our amp branch consumes pre-normalized inputs directly
    amp_agent = object.__new__(type(agent))
    amp_agent.cfg = __import__("dataclasses").replace(
        agent.cfg, disc_mode="amp"
    )
    amp_agent.net = agent.net
    our_loss, our_info = amp_agent._disc_loss(
        ts.params,
        {"disc_in": jnp.asarray(neg), "disc_pos": jnp.asarray(pos)},
    )
    np.testing.assert_allclose(
        float(our_info["disc_grad_penalty"]),
        float(disc_info["disc_grad_penalty"].detach()),
        atol=3e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(our_loss), float(disc_info["disc_loss"].detach()),
        atol=5e-4, rtol=1e-4,
    )


# ----------------------------------------------------- optimizer-step parity


def _grad_leaf_pairs(torch, model, grad_tree):
    """[(torch_param, grad_tensor)] mapping our grad pytree onto the
    reference model's parameters (inverse of _load_weights)."""
    g = grad_tree["params"]

    def linears(seq):
        return [m for m in seq if isinstance(m, torch.nn.Linear)]

    pairs = []
    for tree_name, seq in (
        ("actor_trunk", linears(model._actor_layers)),
        ("critic_trunk", linears(model._critic_layers)),
        ("disc_trunk", linears(model._disc_layers)),
    ):
        for i, lin in enumerate(seq):
            k = g[tree_name][f"Dense_{i}"]
            pairs.append((lin.weight, torch.from_numpy(np.asarray(k["kernel"]).T.copy())))
            pairs.append((lin.bias, torch.from_numpy(np.asarray(k["bias"]).copy())))
    for head, name in (
        (model._action_dist._mean_net, "actor_mean"),
        (model._critic_out, "critic_out"),
        (model._disc_logits, "disc_logit"),
    ):
        pairs.append((head.weight, torch.from_numpy(np.asarray(g[name]["kernel"]).T.copy())))
        pairs.append((head.bias, torch.from_numpy(np.asarray(g[name]["bias"]).copy())))
    return pairs


def _read_params_like(torch, model, params_tree):
    """Torch params read back into our pytree layout (for comparison)."""
    out = jax.tree_util.tree_map(lambda x: None, params_tree)
    p = dict(jax.tree_util.tree_map(np.asarray, params_tree)["params"])

    def linears(seq):
        return [m for m in seq if isinstance(m, torch.nn.Linear)]

    got = {}
    for tree_name, seq in (
        ("actor_trunk", linears(model._actor_layers)),
        ("critic_trunk", linears(model._critic_layers)),
        ("disc_trunk", linears(model._disc_layers)),
    ):
        got[tree_name] = {
            f"Dense_{i}": dict(
                kernel=lin.weight.detach().numpy().T.copy(),
                bias=lin.bias.detach().numpy().copy(),
            )
            for i, lin in enumerate(seq)
        }
    for head, name in (
        (model._action_dist._mean_net, "actor_mean"),
        (model._critic_out, "critic_out"),
        (model._disc_logits, "disc_logit"),
    ):
        got[name] = dict(
            kernel=head.weight.detach().numpy().T.copy(),
            bias=head.bias.detach().numpy().copy(),
        )
    return got


def _tree_max_abs_diff(a, b):
    worst = 0.0
    for ka in a:
        for kb in a[ka]:
            if isinstance(a[ka][kb], dict):
                for kc in a[ka][kb]:
                    worst = max(worst, float(np.max(np.abs(a[ka][kb][kc] - b[ka][kb][kc]))))
            else:
                worst = max(worst, float(np.max(np.abs(a[ka][kb] - b[ka][kb]))))
    return worst


@pytest.mark.parametrize("opt_name", ["adam", "fused_adam"])
def test_optimizer_step_matches_reference(stack, opt_name):
    """Identical gradients through the reference's MPOptimizer (AdamW +
    clip_grad_norm 1.0, mp_optimizer.py:14-47) vs our optax chain AND
    fused_clip_adam: updated parameters match at f32 tolerance over three
    sequential steps (exercising the adam moments, not just step one)."""
    torch = _torch()
    import optax
    from dataclasses import replace as dc_replace

    from add_gym.learning.mp_optimizer import MPOptimizer

    from add_gym_tpu.learning.optim import fused_clip_adam

    agent, ts, data, traj = (
        stack["agent"], stack["ts"], stack["data"], stack["traj"],
    )
    model, _ = _build_ref_model(
        torch, agent, agent.env.obs_dim(), agent.env.disc_obs_dim()
    )
    _load_weights(torch, model, ts.params)
    ref_opt = MPOptimizer(
        {
            "type": "Adam",
            "learning_rate": agent.cfg.learning_rate,
            "grad_clip": agent.cfg.grad_clip,
        },
        list(model.parameters()),
    )

    if opt_name == "adam":
        our_opt = optax.chain(
            optax.clip_by_global_norm(agent.cfg.grad_clip),
            optax.adamw(agent.cfg.learning_rate, weight_decay=0.0),
        )
    else:
        our_opt = fused_clip_adam(
            agent.cfg.learning_rate, clip=agent.cfg.grad_clip
        )
    params = ts.params
    opt_state = our_opt.init(params)

    M = T * N
    flatten = lambda x: np.asarray(x).reshape((M,) + np.asarray(x).shape[2:])
    grad_fn = jax.jit(jax.grad(lambda p, b: agent._loss(p, b)[0]))

    for step in range(3):
        rows = slice(step * (M // 3), (step + 1) * (M // 3))
        batch = {
            "norm_obs": jnp.asarray(flatten(data["norm_obs"])[rows]),
            "norm_a": jnp.asarray(flatten(data["norm_a"])[rows]),
            "a_logp": jnp.asarray(flatten(traj["a_logp"])[rows]),
            "tar_val": jnp.asarray(flatten(data["tar_val"])[rows]),
            "adv": jnp.asarray(flatten(data["adv"])[rows]),
            "rand_mask": jnp.asarray(flatten(traj["rand_mask"])[rows]),
            "disc_in": jnp.asarray(flatten(data["disc_in"])[rows]),
        }
        grads = grad_fn(params, batch)

        # reference side: inject the same grads, clip, AdamW step
        ref_opt._optimizer.zero_grad()
        for p, g in _grad_leaf_pairs(torch, model, grads):
            p.grad = g
        ref_opt._clip_grads(ref_opt._grad_clip)
        ref_opt._optimizer.step()

        updates, opt_state = our_opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    ours = jax.tree_util.tree_map(np.asarray, params)["params"]
    theirs = _read_params_like(torch, model, params)
    worst = _tree_max_abs_diff(ours, theirs)
    # three adam steps of magnitude ~lr each; f32 + the 1e-6 difference in
    # torch's clip denominator bound the drift far below one step's size
    assert worst < 2e-6, f"param drift {worst} after 3 optimizer steps"


def test_closed_loop_train_iters_track_reference(stack):
    """Closed-loop replay (ref base_agent.py:353-374): starting from
    identical weights, run TWO full train iterations — data build (disc
    reward + TD(lambda) + advantages, recomputed from the CURRENT params
    each iteration) followed by 2 epochs x 2 deterministic minibatches of
    loss -> grad -> optimizer — on our stack and through the reference's
    own torch methods + MPOptimizer.  The parameter trajectories must
    track: the compounding of every per-iteration quantity is pinned, not
    just isolated terms."""
    torch = _torch()
    import optax
    from add_gym.learning.base_agent import DoneFlags as RefDone
    from add_gym.learning.base_agent import compute_td_lambda_return
    import add_gym.learning.add.add_agent as ref_add
    import add_gym.learning.ppo_agent as ref_ppo
    from add_gym.learning.mp_optimizer import MPOptimizer

    agent, ts0, traj = stack["agent"], stack["ts"], stack["traj"]
    cfg = agent.cfg
    obs_dim, disc_dim = agent.env.obs_dim(), agent.env.disc_obs_dim()

    # --- reference stack with our initial weights --------------------
    model, a_space = _build_ref_model(torch, agent, obs_dim, disc_dim)
    _load_weights(torch, model, ts0.params)
    obs_norm, disc_norm = _ref_normalizers(torch, ts0)
    ref = object.__new__(ref_add.ADDAgent)
    torch.nn.Module.__init__(ref)
    ref.model = model
    ref._obs_norm = obs_norm
    ref._disc_obs_norm = disc_norm
    ref._pos_diff = torch.zeros(disc_dim)
    ref._env = SimpleNamespace(
        robot=SimpleNamespace(get_action_space=lambda: a_space)
    )
    for attr, val in (
        ("_ppo_clip_ratio", cfg.ppo_clip_ratio),
        ("_action_bound_weight", cfg.action_bound_weight),
        ("_action_entropy_weight", cfg.action_entropy_weight),
        ("_action_reg_weight", cfg.action_reg_weight),
        ("_critic_loss_weight", cfg.critic_loss_weight),
        ("_disc_logit_reg", cfg.disc_logit_reg),
        ("_disc_grad_penalty", cfg.disc_grad_penalty),
        ("_disc_weight_decay", cfg.disc_weight_decay),
    ):
        setattr(ref, attr, val)
    ref_opt = MPOptimizer(
        {"type": "Adam", "learning_rate": cfg.learning_rate,
         "grad_clip": cfg.grad_clip},
        list(model.parameters()),
    )

    # --- our stack: same optimizer config as the agent ---------------
    our_opt = agent.optimizer
    params = ts0.params
    opt_state = our_opt.init(params)

    M = T * N
    flatten = lambda x: np.asarray(x).reshape((M,) + np.asarray(x).shape[2:])
    tt = lambda x: torch.from_numpy(np.asarray(x, np.float32))
    halves = [slice(0, M // 2), slice(M // 2, M)]
    n_epochs = 2

    a_mean_t = torch.from_numpy(np.asarray(agent.a_mean))
    a_std_t = torch.from_numpy(np.asarray(agent.a_std))

    loss_grad = jax.jit(jax.value_and_grad(
        lambda p, b: agent._loss(p, b)[0]
    ))
    build = jax.jit(
        lambda ts, traj: agent.build_train_data(ts, traj)[1]
    )

    from dataclasses import replace as dc_replace

    for it in range(2):
        # ---- our data build with CURRENT params ----
        ts_cur = dc_replace(ts0, params=params)
        data = build(ts_cur, traj)
        data_np = {k: np.asarray(v) for k, v in data.items()
                   if hasattr(v, "shape")}

        # ---- reference data build with ITS current params ----
        with torch.no_grad():
            diff = tt(traj["disc_obs_demo"]) - tt(traj["disc_obs"])
            norm_diff = disc_norm.normalize(diff)
            logits = model.eval_disc(norm_diff).squeeze(-1)
            prob = 1.0 / (1.0 + torch.exp(-logits))
            disc_r = -torch.log(torch.clamp_min(1.0 - prob, 1e-4))
            r = (cfg.task_reward_weight * tt(traj["reward"])
                 + cfg.disc_reward_weight * disc_r * cfg.disc_reward_scale)
            next_vals = model.eval_critic(
                obs_norm.normalize(tt(traj["next_obs"]))).squeeze(-1)
            done_t = torch.from_numpy(np.asarray(traj["done"], np.int64))
            next_vals[done_t == RefDone.SUCC.value] = 0.0
            next_vals[done_t == RefDone.FAIL.value] = 0.0
            rets = compute_td_lambda_return(
                r, next_vals, done_t, cfg.discount, cfg.td_lambda)
            vals = model.eval_critic(
                obs_norm.normalize(tt(traj["obs"]))).squeeze(-1)
            adv = rets - vals
            mask_t = tt(traj["rand_mask"]).flatten() == 1.0
            adv_std, adv_mean = torch.std_mean(adv.flatten()[mask_t], dim=0)
            norm_adv = torch.clamp(
                (adv - adv_mean) / torch.clamp_min(adv_std, 1e-5),
                -cfg.norm_adv_clip, cfg.norm_adv_clip)

        # the two sides' data must agree before the updates compound
        np.testing.assert_allclose(
            data_np["tar_val"], rets.numpy(), atol=5e-4
        )

        # ---- epoch/minibatch updates, deterministic order ----
        for _ in range(n_epochs):
            for rows in halves:
                batch = {
                    "norm_obs": jnp.asarray(flatten(data_np["norm_obs"])[rows]),
                    "norm_a": jnp.asarray(flatten(data_np["norm_a"])[rows]),
                    "a_logp": jnp.asarray(flatten(traj["a_logp"])[rows]),
                    "tar_val": jnp.asarray(flatten(data_np["tar_val"])[rows]),
                    "adv": jnp.asarray(flatten(data_np["adv"])[rows]),
                    "rand_mask": jnp.asarray(flatten(traj["rand_mask"])[rows]),
                    "disc_in": jnp.asarray(flatten(data_np["disc_in"])[rows]),
                }
                _, grads = loss_grad(params, batch)
                updates, opt_state = our_opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                rbatch = {
                    "obs": tt(flatten(traj["obs"])[rows]),
                    "action": tt(flatten(traj["action"])[rows]),
                    "a_logp": tt(flatten(traj["a_logp"])[rows]),
                    "tar_val": rets.flatten()[rows].detach(),
                    "adv": norm_adv.flatten()[rows].detach(),
                    "rand_action_mask": tt(flatten(traj["rand_mask"])[rows]),
                    "disc_obs": tt(flatten(traj["disc_obs"])[rows]),
                    "disc_obs_demo": tt(flatten(traj["disc_obs_demo"])[rows]),
                }
                rbatch["norm_obs"] = obs_norm.normalize(rbatch["obs"])
                rbatch["norm_action"] = (rbatch["action"] - a_mean_t) / a_std_t
                critic_info = ref_ppo.PPOAgent._compute_critic_loss(ref, rbatch)
                actor_info = ref_ppo.PPOAgent._compute_actor_loss(ref, rbatch)
                disc_info = ref_add.ADDAgent._compute_disc_loss(ref, rbatch)
                ref_loss = (
                    actor_info["actor_loss"]
                    + cfg.critic_loss_weight * critic_info["critic_loss"]
                    + cfg.disc_loss_weight * disc_info["disc_loss"]
                )
                ref_opt.step(ref_loss)

        ours = jax.tree_util.tree_map(np.asarray, params)["params"]
        theirs = _read_params_like(torch, model, params)
        worst = _tree_max_abs_diff(ours, theirs)
        # 4 optimizer steps per iteration at ~lr=1e-4 update magnitude;
        # track within a small fraction of one update step
        assert worst < 3e-5, (
            f"param trajectory diverged after iteration {it}: {worst}"
        )
