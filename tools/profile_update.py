"""Ablate update_model to locate the ~60 ms of non-matmul time.

Times variants of the 5-epoch/8-minibatch update on the real device with
identical input data.  Sync rule for the axon tunnel: fetch a scalar from
the last output (block_until_ready alone does not synchronize dispatch
through the tunnel — memory notes, round 2).

Usage: python tools/profile_update.py [num_envs]
"""

import os
import sys
import time
from dataclasses import replace as dc_replace

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_comp")
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np
import jax
import jax.numpy as jnp
import optax


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(jnp.ravel(leaf)[0]))


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:>28s}: compile {c:6.1f} s   each {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from add_gym_tpu.utils.config import load_config
    from add_gym_tpu.builder import build_env, build_agent

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = N
    env = build_env(cfg)
    agent = build_agent(cfg, env)
    acfg = agent.cfg
    T = acfg.steps_per_iter
    print(f"num_envs={N} T={T} epochs={acfg.update_epochs} "
          f"mb={acfg.batch_size * N} obs={env.obs_dim()} disc={env.disc_obs_dim()}")

    ts = agent.init_train_state()
    key = jax.random.PRNGKey(0)

    # synthetic post-build data with the exact shapes/dtypes update_model sees
    obs_dim, disc_dim, nd = env.obs_dim(), env.disc_obs_dim(), env.num_dofs
    ks = jax.random.split(key, 8)
    f32, bf16 = jnp.float32, jnp.bfloat16
    data = dict(
        reward=jax.random.normal(ks[0], (T, N), f32),
        norm_obs=jax.random.normal(ks[1], (T, N, obs_dim), f32),
        norm_a=jax.random.normal(ks[2], (T, N, nd), f32),
        a_logp=jax.random.normal(ks[3], (T, N), f32),
        tar_val=jax.random.normal(ks[4], (T, N), f32),
        adv=jax.random.normal(ks[5], (T, N), f32),
        rand_mask=jnp.ones((T, N), f32),
        disc_in=jax.random.normal(ks[6], (T, N, disc_dim), f32),
    )
    if acfg.mixed_precision:
        data["norm_obs"] = data["norm_obs"].astype(bf16)
    k_upd = jax.random.PRNGKey(7)

    # 1. full update as shipped
    upd = jax.jit(lambda ts, d, k: agent.update_model(ts, d, k)[0].params)
    t_full = timeit("full", upd, ts, data, k_upd)

    # 2. optimizer = plain SGD, no global-norm clip (isolates adam m/v +
    #    clip traffic)
    agent_sgd = build_agent(cfg, env)
    agent_sgd.optimizer = optax.sgd(1e-4)
    ts_sgd = dc_replace(ts, opt_state=agent_sgd.optimizer.init(ts.params))
    upd_sgd = jax.jit(lambda ts, d, k: agent_sgd.update_model(ts, d, k)[0].params)
    timeit("sgd_noclip", upd_sgd, ts_sgd, data, k_upd)

    # 3. no discriminator loss at all (removes disc fwd/bwd + double bwd)
    cfg_nd = dict(cfg)
    cfg_nd["agent"] = dict(cfg["agent"], disc_mode="none")
    agent_nd = build_agent(cfg_nd, env)
    agent_nd.optimizer = agent.optimizer
    upd_nd = jax.jit(lambda ts, d, k: agent_nd.update_model(ts, d, k)[0].params)
    timeit("no_disc", upd_nd, ts, data, k_upd)

    # 4. disc without the grad penalty (isolates the double backward)
    class NoGP(type(agent)):
        def _disc_loss(self, params, batch):
            from add_gym_tpu.learning.networks import ADDNet
            cfgl = self.cfg
            neg_input = batch["disc_in"]
            pos_input = jnp.zeros((1, neg_input.shape[-1]))
            neg_logit = self.net.apply(params, neg_input, method=ADDNet.disc)
            pos_logit = self.net.apply(params, pos_input, method=ADDNet.disc)
            l = 0.5 * (
                jnp.mean(optax.sigmoid_binary_cross_entropy(
                    pos_logit, 0.9 * jnp.ones_like(pos_logit)))
                + jnp.mean(optax.sigmoid_binary_cross_entropy(
                    neg_logit, 0.1 * jnp.ones_like(neg_logit)))
            )
            return l, dict(disc_loss=l)

    agent_ngp = NoGP.__new__(NoGP)
    agent_ngp.__dict__.update(agent.__dict__)
    upd_ngp = jax.jit(lambda ts, d, k: agent_ngp.update_model(ts, d, k)[0].params)
    timeit("no_grad_penalty", upd_ngp, ts, data, k_upd)

    # 4b. hand-fused clip+adam (single global-norm pass, one tree_map for
    #     mu/nu/update — no materialized scaled-grad or update trees)
    def fused_clip_adam(lr=1e-4, clip=1.0, b1=0.9, b2=0.999, eps=1e-8):
        def init(params):
            z = jax.tree_util.tree_map(jnp.zeros_like, params)
            return dict(mu=z, nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                        count=jnp.zeros((), jnp.int32))

        def update(grads, state, params=None):
            gsq = sum(jnp.sum(jnp.square(g))
                      for g in jax.tree_util.tree_leaves(grads))
            gn = jnp.sqrt(gsq)
            scale = jnp.minimum(1.0, clip / jnp.maximum(gn, 1e-12))
            c = state["count"] + 1
            bc1 = 1.0 - b1 ** c.astype(jnp.float32)
            bc2 = 1.0 - b2 ** c.astype(jnp.float32)

            def leaf(g, mu, nu):
                g = g * scale
                mu = b1 * mu + (1 - b1) * g
                nu = b2 * nu + (1 - b2) * jnp.square(g)
                u = -lr * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
                return u, mu, nu

            out = jax.tree_util.tree_map(
                leaf, grads, state["mu"], state["nu"],
            )
            # tree_map with multi-output: restructure
            treedef = jax.tree_util.tree_structure(grads)
            flat = jax.tree_util.tree_leaves(
                out, is_leaf=lambda x: isinstance(x, tuple))
            ups = jax.tree_util.tree_unflatten(treedef, [t[0] for t in flat])
            mus = jax.tree_util.tree_unflatten(treedef, [t[1] for t in flat])
            nus = jax.tree_util.tree_unflatten(treedef, [t[2] for t in flat])
            return ups, dict(mu=mus, nu=nus, count=c)

        return optax.GradientTransformation(init, update)

    agent_fo = build_agent(cfg, env)
    agent_fo.optimizer = fused_clip_adam()
    ts_fo = dc_replace(ts, opt_state=agent_fo.optimizer.init(ts.params))
    upd_fo = jax.jit(lambda ts, d, k: agent_fo.update_model(ts, d, k)[0].params)
    timeit("fused_clip_adam", upd_fo, ts_fo, data, k_upd)

    # 5. grads only, no optimizer.update (params nudged by scaled grads —
    #    keeps the scan carry honest without touching opt state)
    def upd_graddonly(ts, d, k):
        cfgl = agent.cfg
        Tn, Nn = d["a_logp"].shape
        keep = ("norm_obs", "norm_a", "a_logp", "tar_val", "adv",
                "rand_mask", "disc_in")
        flat = {kk: d[kk].reshape((Tn * Nn,) + d[kk].shape[2:]) for kk in keep}
        M = Tn * Nn
        nb = int(np.ceil(Tn / cfgl.batch_size))
        mb = M // nb

        def epoch_fn(carry, key_e):
            params = carry
            perm = jax.random.permutation(key_e, M)
            idx = perm[: nb * mb].reshape(nb, mb)

            def mb_fn(params, mb_idx):
                batch = {kk: v[mb_idx] for kk, v in flat.items()}
                _, grads = jax.value_and_grad(agent._loss, has_aux=True)(
                    params, batch)
                params = jax.tree_util.tree_map(
                    lambda p, g: p - 1e-8 * g, params, grads)
                return params, 0.0
            params, _ = jax.lax.scan(mb_fn, params, idx)
            return params, 0.0

        keys = jax.random.split(k, cfgl.update_epochs)
        params, _ = jax.lax.scan(epoch_fn, ts.params, keys)
        return params
    timeit("grads_only_no_opt", jax.jit(upd_graddonly), ts, data, k_upd)

    # 6. gathers only: the REAL shuffle/gather structure (block permutation
    #    via pick_shuffle_block, exactly what _epoch_scan does), trivially
    #    consumed.  NOTE: an earlier revision of this ablation permuted
    #    single rows (B=1) — that measured 66.66 ms (.runs/
    #    profile_update_r4.log) and was NOT what the shipped update pays;
    #    the mislabel is reconciled in .runs/profile_update_r5.log.
    from add_gym_tpu.learning.add_agent import pick_shuffle_block

    def upd_gathers(d, k):
        cfgl = agent.cfg
        Tn, Nn = d["a_logp"].shape
        keep = ("norm_obs", "norm_a", "a_logp", "tar_val", "adv",
                "rand_mask", "disc_in")
        flat = {kk: d[kk].reshape((Tn * Nn,) + d[kk].shape[2:]) for kk in keep}
        M = Tn * Nn
        nb = int(np.ceil(Tn / cfgl.batch_size))
        mb = M // nb
        B = pick_shuffle_block(M, nb, mb, Nn)
        if B > 1:
            flat = {kk: v.reshape((M // B, B) + v.shape[1:])
                    for kk, v in flat.items()}
        nblk, mb_blk = M // B, mb // B

        def epoch_fn(carry, key_e):
            perm = jax.random.permutation(key_e, nblk)
            idx = perm[: nb * mb_blk].reshape(nb, mb_blk)

            def mb_fn(c, mb_idx):
                batch = {kk: v[mb_idx] for kk, v in flat.items()}
                s = sum(jnp.sum(v.astype(jnp.float32)) for v in batch.values())
                return c + s, 0.0
            c, _ = jax.lax.scan(mb_fn, carry, idx)
            return c, 0.0

        keys = jax.random.split(k, cfgl.update_epochs)
        c, _ = jax.lax.scan(epoch_fn, jnp.zeros(()), keys)
        return c
    timeit(f"gathers_only(real blocks)", jax.jit(upd_gathers), data, k_upd)

    # 6b. gathers at B=1 (the old mislabeled variant, kept for comparison)
    def upd_gathers_b1(d, k):
        cfgl = agent.cfg
        Tn, Nn = d["a_logp"].shape
        keep = ("norm_obs", "norm_a", "a_logp", "tar_val", "adv",
                "rand_mask", "disc_in")
        flat = {kk: d[kk].reshape((Tn * Nn,) + d[kk].shape[2:]) for kk in keep}
        M = Tn * Nn
        nb = int(np.ceil(Tn / cfgl.batch_size))
        mb = M // nb

        def epoch_fn(carry, key_e):
            perm = jax.random.permutation(key_e, M)
            idx = perm[: nb * mb].reshape(nb, mb)

            def mb_fn(c, mb_idx):
                batch = {kk: v[mb_idx] for kk, v in flat.items()}
                s = sum(jnp.sum(v.astype(jnp.float32)) for v in batch.values())
                return c + s, 0.0
            c, _ = jax.lax.scan(mb_fn, carry, idx)
            return c, 0.0

        keys = jax.random.split(k, cfgl.update_epochs)
        c, _ = jax.lax.scan(epoch_fn, jnp.zeros(()), keys)
        return c
    timeit("gathers_only(B=1 rows)", jax.jit(upd_gathers_b1), data, k_upd)

    # 7. pure matmul floor at the same shapes: the 3 trunks fwd+bwd per
    #    minibatch via value_and_grad of a dummy quadratic loss
    params = ts.params

    def matmul_loss(params, xo, xd):
        from add_gym_tpu.learning.networks import ADDNet
        m, _ = agent._ac_apply(params, xo, ADDNet.actor)
        v = agent._ac_apply(params, xo, ADDNet.critic)
        dl = agent.net.apply(params, xd, method=ADDNet.disc)
        return jnp.mean(m * m) + jnp.mean(v * v) + jnp.mean(dl * dl)

    mb = acfg.batch_size * N
    nb = int(np.ceil(T / acfg.batch_size))
    xo = jax.random.normal(ks[1], (mb, obs_dim), f32)
    xd = jax.random.normal(ks[6], (mb, disc_dim), f32)

    def matmul_floor(params, xo, xd):
        def mb_fn(p, _):
            g = jax.grad(matmul_loss)(p, xo, xd)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-8 * b, p, g)
            return p, 0.0
        p, _ = jax.lax.scan(
            mb_fn, params, None, length=acfg.update_epochs * nb)
        return p
    timeit("matmul_floor(3 trunks f/b)", jax.jit(matmul_floor), params, xo, xd)

    print("done")


if __name__ == "__main__":
    main()
