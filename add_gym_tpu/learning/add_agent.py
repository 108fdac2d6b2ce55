"""ADD agent: PPO + adversarial differential discriminator, fully on-device.

TPU-native re-design of the reference agent stack (BaseAgent -> PPOAgent ->
AMPAgent -> ADDAgent, SURVEY.md §2.4): one jitted ``train_iter`` fuses the
rollout (lax.scan over env steps with masked auto-resets), reward/advantage
construction (TD(λ) as a reverse scan), the discriminator reward on
normalized observation *differences*, the adaptive-sampler error update, and
the epoch/minibatch PPO+ADD parameter update.

Under a sharded env axis (GSPMD) every batch statistic — advantage
mean/std, normalizer stats, gradients — is a global reduction, replacing
the reference's DDP/NCCL all-reduces (SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import optax

from add_gym_tpu.envs.done import DoneFlags
from add_gym_tpu.envs.imitation import EnvState, ImitationEnv
from add_gym_tpu.learning import distributions as dist
from add_gym_tpu.learning import normalizer as norm
from add_gym_tpu.learning import sampler as sampler_mod
from add_gym_tpu.learning.networks import ADDNet


@dataclass(frozen=True)
class AgentConfig:
    """Hyperparameters (configs/agent/add_g1.yaml + train.yaml)."""

    discount: float = 0.99
    td_lambda: float = 0.95
    steps_per_iter: int = 32
    update_epochs: int = 5
    batch_size: int = 4              # minibatch = batch_size * num_envs
    ppo_clip_ratio: float = 0.2
    norm_adv_clip: float = 4.0
    action_bound_weight: float = 10.0
    action_entropy_weight: float = 0.0
    action_reg_weight: float = 0.0
    critic_loss_weight: float = 1.0
    learning_rate: float = 1e-4
    grad_clip: float = 1.0
    # "adam" (AdamW, reference default) or "sgd" (+momentum 0.9),
    # ref mp_optimizer.py:28-47
    optimizer: str = "adam"
    momentum: float = 0.9
    disc_loss_weight: float = 0.5
    disc_logit_reg: float = 0.01
    disc_grad_penalty: float = 20.0
    disc_weight_decay: float = 1e-4
    disc_reward_scale: float = 2.0
    task_reward_weight: float = 0.0
    disc_reward_weight: float = 1.0
    action_std: float = 0.05
    # StdType (distribution_gaussian_diag.py:6-9): fixed | constant | variable
    actor_std_type: str = "fixed"
    exp_prob: float = 1.0            # initial exploration probability
    # linear anneal exp_prob -> exp_prob_end over exp_anneal_samples
    # (ppo_agent.py:160-169; inf = constant, the reference default)
    exp_prob_end: float = 1.0
    exp_anneal_samples: float = float("inf")
    normalizer_samples: float = 1e8
    # discriminator mode (reference agent hierarchy, SURVEY.md §2.4):
    #   "add"  — ADDAgent: disc on normalized obs *differences*, zero-vector
    #            positives (add_agent.py:62-67,144-178)
    #   "amp"  — AMPAgent: disc on obs directly, demo positives / agent
    #            negatives (amp_agent.py:98-206)
    #   "none" — plain PPOAgent: no discriminator, task reward only
    disc_mode: str = "add"
    actor_net: str = "fc_3layers_1024units"
    critic_net: str = "fc_3layers_1024units"
    disc_net: str = "fc_2layers_1024units"
    actor_init_output_scale: float = 0.01
    # bf16 actor/critic trunk matmuls with f32 master weights and f32
    # heads/losses.  Applied consistently in rollout, data build and update
    # so the behavior policy and its recorded log-probs stay bitwise
    # consistent (epoch-0 PPO ratio == 1).  Parity evidence:
    # docs/TRAINING.md.
    mixed_precision: bool = False
    # bf16 discriminator trunk matmuls (f32 master weights, f32 logit head
    # and losses).  The grad penalty differentiates the SAME quantized
    # function the BCE terms use (one disc, not two), with the input
    # cotangent cast to f32 before the norm; the second-order penalty
    # gradient flows back through the bf16 trunk.  Separate flag from
    # mixed_precision so exact-f32 parity runs can disable each
    # independently.  Parity evidence: docs/TRAINING.md.
    disc_mixed_precision: bool = False
    # minibatch shuffle granularity (see pick_shuffle_block):
    #   "auto"     — permute 32/8/1-row blocks by divisibility (round 3-4
    #                measured scheme)
    #   "timestep" — permute whole timesteps (block = num_envs): minibatch
    #                gathers become contiguous slab slices (~free on TPU).
    #                Each minibatch = batch_size random timesteps x all
    #                envs; samples within a timestep are independent
    #                episodes, cross-timestep composition is a coarser
    #                without-replacement partition than row shuffling
    #                (learning A/B: docs/TRAINING.md round 5)
    minibatch_blocks: str = "auto"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class TrainState:
    params: Any
    opt_state: Any
    obs_norm: norm.NormState
    disc_norm: norm.DiffNormState
    sampler: sampler_mod.SamplerState
    sample_count: jnp.ndarray  # [] int


class ADDAgent:
    """Binds env + networks + config into jitted pure training functions."""

    def __init__(self, env: ImitationEnv, cfg: AgentConfig, key):
        self.env = env
        self.cfg = cfg
        assert cfg.disc_mode in ("add", "amp", "none"), cfg.disc_mode
        self.net = ADDNet(
            action_dim=env.num_dofs,
            actor_net=cfg.actor_net,
            critic_net=cfg.critic_net,
            disc_net=cfg.disc_net,
            actor_init_output_scale=cfg.actor_init_output_scale,
            enable_disc=cfg.disc_mode != "none",
            std_type=cfg.actor_std_type,
            init_logstd=float(np.log(cfg.action_std)),
        )
        self.logstd = float(np.log(cfg.action_std))

        # action normalizer from the action space (base_agent.py:233-266)
        self.a_mean = jnp.asarray(
            0.5 * (env.action_high + env.action_low), jnp.float32
        )
        self.a_std = jnp.asarray(
            0.5 * (env.action_high - env.action_low), jnp.float32
        )

        if cfg.optimizer == "sgd":
            opt = optax.sgd(cfg.learning_rate, momentum=cfg.momentum)
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip), opt
            )
        elif cfg.optimizer == "fused_adam":
            # clip+adam in one tree pass (learning/optim.py); numerically
            # equal to the chain below (test_learning pin)
            from add_gym_tpu.learning.optim import fused_clip_adam

            self.optimizer = fused_clip_adam(
                cfg.learning_rate, clip=cfg.grad_clip
            )
        else:
            opt = optax.adamw(cfg.learning_rate, weight_decay=0.0)
            # NOTE (measured, round 3): optax.flatten-ing this chain costs
            # ~8 ms per update on v5e (the per-minibatch ravel/unravel
            # materializes the 5.5M-param vector twice); per-leaf fusions
            # are faster.
            self.optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip), opt
            )
        self._key = key

    def net_params_by_trunk(self):
        """Matmul parameter counts (sum of in*out per layer) per network.

        Used by the bench floor arithmetic (bench.py / docs/SCALING.md):
        matmul FLOPs per sample = 2x these counts forward, 4x backward.
        """
        from add_gym_tpu.learning.networks import NET_REGISTRY

        obs_dim = self.env.obs_dim()
        disc_dim = self.env.disc_obs_dim()
        nd = self.env.num_dofs

        def mm(in_dim, widths, out_dim):
            tot, d = 0, in_dim
            for w in widths:
                tot += d * w
                d = w
            return tot + d * out_dim

        cfg = self.cfg
        return dict(
            actor=mm(obs_dim, NET_REGISTRY[cfg.actor_net], nd),
            critic=mm(obs_dim, NET_REGISTRY[cfg.critic_net], 1),
            disc=(
                mm(disc_dim, NET_REGISTRY[cfg.disc_net], 1)
                if cfg.disc_mode != "none" else 0
            ),
        )

    def alternate_opt_templates(self, params):
        """Opt-state templates for the OTHER adam-family optimizer configs.

        Checkpoint migration (Trainer.load): the "adam" optax chain and
        "fused_adam" carry the same moments in different tree shapes, so a
        checkpoint saved under one must restore under the other.  Returns
        [(name, template_opt_state), ...] excluding the active config.
        """
        from add_gym_tpu.learning.optim import fused_clip_adam

        cfg = self.cfg
        candidates = {
            "adam": optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip),
                optax.adamw(cfg.learning_rate, weight_decay=0.0),
            ),
            "fused_adam": fused_clip_adam(cfg.learning_rate, clip=cfg.grad_clip),
        }
        return [
            (name, opt.init(params))
            for name, opt in candidates.items()
            if name != cfg.optimizer
        ]

    # ------------------------------------------------------------------ init

    def init_train_state(self, key=None) -> TrainState:
        if key is None:
            key, self._key = jax.random.split(self._key)
        k1 = key
        obs_dim = self.env.obs_dim()
        disc_dim = self.env.disc_obs_dim()
        params = self.net.init(
            k1, jnp.zeros((1, obs_dim)), jnp.zeros((1, disc_dim))
        )
        # "add" normalizes obs *differences* by mean-|x| (DiffNormalizer);
        # "amp" normalizes disc obs with a running mean/std Normalizer
        if self.cfg.disc_mode == "amp":
            disc_norm = norm.init_normalizer((disc_dim,))
        else:
            disc_norm = norm.init_diff_normalizer((disc_dim,))
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            obs_norm=norm.init_normalizer((obs_dim,)),
            disc_norm=disc_norm,
            sampler=sampler_mod.init_sampler(
                self.env.motion.num_motions, self.env.task.sampler_num_segments
            ),
            sample_count=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------- mixed precision

    def _cast_trunks(self, params, names):
        """bf16 copies of the named trunk params (heads stay f32, so
        means/values/logits come back at full precision from cheap f32
        head matmuls on bf16 hidden activations)."""
        p = dict(params["params"])
        for k in names:
            if k in p:
                p[k] = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16), p[k]
                )
        return {**params, "params": p}

    def _ac_apply(self, params, norm_obs, method):
        """Actor/critic forward at the configured precision.

        Every call site (rollout action, data-build critic, update losses)
        goes through here so mixed_precision quantizes ONE consistent
        policy/value function — recorded rollout log-probs match the
        update's epoch-0 recomputation exactly.
        """
        if self.cfg.mixed_precision:
            params = self._cast_trunks(params, ("actor_trunk", "critic_trunk"))
            norm_obs = norm_obs.astype(jnp.bfloat16)
        out = self.net.apply(params, norm_obs, method=method)
        return jax.tree_util.tree_map(
            lambda x: None if x is None else x.astype(jnp.float32), out,
            is_leaf=lambda x: x is None,
        )

    def _disc_apply(self, params, x):
        """Discriminator forward at the configured precision (f32 logits).

        All disc consumers (reward in the data build, BCE logits AND the
        grad-penalty vjp in the loss) go through here, so
        disc_mixed_precision quantizes ONE consistent discriminator.
        """
        if self.cfg.disc_mixed_precision:
            params = self._cast_trunks(params, ("disc_trunk",))
            x = x.astype(jnp.bfloat16)
        return self.net.apply(params, x, method=ADDNet.disc).astype(
            jnp.float32
        )

    # --------------------------------------------------------------- acting

    def _exp_prob(self, sample_count):
        """Annealed exploration probability.  Ref: ppo_agent.py:160-169."""
        cfg = self.cfg
        if not np.isfinite(cfg.exp_anneal_samples):
            return cfg.exp_prob
        l = jnp.clip(
            sample_count.astype(jnp.float32) / cfg.exp_anneal_samples, 0.0, 1.0
        )
        return (1.0 - l) * cfg.exp_prob + l * cfg.exp_prob_end

    def _decide_action(self, params, obs_norm, key, obs, train: bool,
                       exp_prob=None):
        """Ref: ppo_agent.py:72-104 (rand-action-mask exploration)."""
        norm_obs = norm.normalize(obs_norm, obs)
        mean, logstd = self._ac_apply(params, norm_obs, ADDNet.actor)
        if logstd is None:  # std_type == "fixed"
            logstd = jnp.full_like(mean, self.logstd)
        if train:
            if exp_prob is None:
                exp_prob = self.cfg.exp_prob
            k1, k2 = jax.random.split(key)
            a_rand = dist.sample(k1, mean, logstd)
            mask = jax.random.bernoulli(
                k2, exp_prob, (mean.shape[0], 1)
            ).astype(jnp.float32)
            norm_a = jnp.where(mask == 1.0, a_rand, mean)
            rand_mask = mask[:, 0]
        else:
            norm_a = mean
            rand_mask = jnp.zeros(mean.shape[0])
        a_logp = dist.log_prob(mean, logstd, norm_a)
        action = norm_a * self.a_std + self.a_mean
        return action, norm_a, a_logp, rand_mask

    # --------------------------------------------------------------- rollout

    def rollout(self, ts: TrainState, env_state: EnvState, obs, key, num_steps,
                train: bool = True):
        """lax.scan over env steps.  Ref: base_agent.py:379-391 + §3.3 flow."""
        env = self.env

        exp_prob = self._exp_prob(ts.sample_count) if train else None

        def step_fn(carry, _):
            env_state, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, _, a_logp, rand_mask = self._decide_action(
                ts.params, ts.obs_norm, k_act, obs, train, exp_prob
            )
            # fused step + masked reset + stacked obs pass (semantically
            # equal to step -> reset_where -> compute_obs, same RNG stream;
            # see ImitationEnv.rollout_step)
            env_state3, obs_after, step_out = env.rollout_step(
                k_reset, env_state, action, ts.sampler
            )
            out = dict(
                obs=obs, action=action, a_logp=a_logp, rand_mask=rand_mask,
                **step_out,
            )
            return (env_state3, obs_after, key), out

        (env_state, obs, _), traj = jax.lax.scan(
            step_fn, (env_state, obs, key), None, length=num_steps
        )
        return env_state, obs, traj

    def rollout_lean(self, ts: TrainState, env_state: EnvState, obs, key,
                     num_steps):
        """Train rollout optimized for the hot path (train_iter only).

        Same semantics as ``rollout(train=True)`` with three structural
        changes (measured on v5e, .runs/profile_rollout_r5.log):

        * **presampled RNG**: action noise, the rand-action bernoulli mask
          and the reset draws (motion ids/start times/DR) are generated in
          batched pre-scan calls and consumed as scan xs — the scan body
          contains no threefry.  The RNG *stream* therefore differs from
          ``rollout`` (same key -> different trajectory), which only
          re-maps sample identities; the distributions are identical.
        * **incremental motion aux** via ``env.rollout_step_cached``.
        * **lean outputs**: records normalized obs at the update's
          consumption dtype plus the normalized action, instead of raw
          obs/next_obs/action; the obs normalizer statistics accumulate
          in the scan carry (sum / sum-sq / count over the acting obs),
          so the raw observation trajectory is never materialized.

        Returns ``(env_state, obs, traj, obs_stats)`` where ``obs_stats``
        = (count, sum[obs_dim], sum_sq[obs_dim]).
        """
        env = self.env
        cfg = self.cfg
        if not env._aux_shiftable:
            # non-consecutive tar_obs_steps: no incremental aux — use the
            # plain rollout and derive the obs stats from the trajectory
            env_state, obs, traj = self.rollout(
                ts, env_state, obs, key, num_steps, train=True
            )
            flat_obs = traj["obs"].reshape((-1, traj["obs"].shape[-1]))
            obs_stats = (
                jnp.float32(flat_obs.shape[0]),
                jnp.sum(flat_obs, axis=0),
                jnp.sum(jnp.square(flat_obs), axis=0),
            )
            return env_state, obs, traj, obs_stats
        N = obs.shape[0]
        nd = env.num_dofs
        exp_prob = self._exp_prob(ts.sample_count)
        out_dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32

        k_noise, k_bern, k_ids, k_times, k_dr = jax.random.split(key, 5)
        noise = jax.random.normal(k_noise, (num_steps, N, nd))
        bern = jax.random.bernoulli(
            k_bern, exp_prob, (num_steps, N, 1)
        ).astype(jnp.float32)
        ids_f = env.motion.sample_motions(k_ids, num_steps * N).reshape(
            num_steps, N
        )
        times_f = env._sample_times(
            k_times, ids_f.reshape(-1), ts.sampler
        ).reshape(num_steps, N)
        if env.dr.enabled:
            from add_gym_tpu.envs.domain_rand import sample_dr

            dr_f = jax.tree_util.tree_map(
                lambda x: x.reshape((num_steps, N) + x.shape[1:]),
                sample_dr(k_dr, env.dr, num_steps * N),
            )
        else:
            dr_f = None
        aux0 = env.motion_aux(env_state)

        def step_fn(carry, xs):
            env_state, obs, aux, stats = carry
            if dr_f is None:
                from add_gym_tpu.envs.domain_rand import init_dr_state

                noise_t, bern_t, ids_t, times_t = xs
                dr_t = init_dr_state(N)
            else:
                noise_t, bern_t, ids_t, times_t, dr_t = xs

            norm_obs = norm.normalize(ts.obs_norm, obs)
            mean, logstd = self._ac_apply(ts.params, norm_obs, ADDNet.actor)
            if logstd is None:  # std_type == "fixed"
                logstd = jnp.full_like(mean, self.logstd)
            a_rand = mean + jnp.exp(logstd) * noise_t
            norm_a = jnp.where(bern_t == 1.0, a_rand, mean)
            rand_mask = bern_t[:, 0]
            a_logp = dist.log_prob(mean, logstd, norm_a)
            action = norm_a * self.a_std + self.a_mean

            stats = (
                stats[0] + jnp.float32(N),
                stats[1] + jnp.sum(obs, axis=0),
                stats[2] + jnp.sum(jnp.square(obs), axis=0),
            )

            env_state3, obs_after, aux3, step_out = env.rollout_step_cached(
                env_state, action, aux, ids_t, times_t, dr_t
            )
            next_obs = step_out.pop("next_obs")
            if cfg.disc_mode != "amp":
                # ADD (and "none") only ever consume the demo-agent
                # DIFFERENCE (disc input, sampler error, diff-normalizer
                # stats) — record it directly and halve the disc-buffer
                # materialization.  AMP needs both sides separately.
                step_out["disc_diff"] = (
                    step_out.pop("disc_obs_demo") - step_out.pop("disc_obs")
                )
            out = dict(
                norm_obs=norm_obs.astype(out_dtype),
                norm_next=norm.normalize(ts.obs_norm, next_obs).astype(
                    out_dtype
                ),
                norm_a=norm_a, a_logp=a_logp, rand_mask=rand_mask,
                **step_out,
            )
            return (env_state3, obs_after, aux3, stats), out

        stats0 = (
            jnp.zeros((), jnp.float32),
            jnp.zeros((obs.shape[-1],), jnp.float32),
            jnp.zeros((obs.shape[-1],), jnp.float32),
        )
        xs = (noise, bern, ids_f, times_f)
        if dr_f is not None:
            xs = xs + (dr_f,)
        (env_state, obs, _, obs_stats), traj = jax.lax.scan(
            step_fn, (env_state, obs, aux0, stats0), xs, length=num_steps
        )
        return env_state, obs, traj, obs_stats

    # ---------------------------------------------------------- train data

    def _disc_inputs(self, disc_norm, disc_obs, disc_demo):
        """Normalized discriminator inputs (negative, positive-or-None).

        Computed ONCE per iteration — the normalizers are frozen during the
        update (base_agent.py:362-366 updates them after), so minibatches
        gather these precomputed tensors instead of re-normalizing 5x.
        """
        if self.cfg.disc_mode == "amp":
            neg = norm.normalize(disc_norm, disc_obs)
            pos = norm.normalize(disc_norm, disc_demo)
        else:
            neg = norm.diff_normalize(disc_norm, disc_demo - disc_obs)
            pos = None
        return neg, pos

    def _disc_reward_from_input(self, params, disc_in):
        """Ref: add_agent.py:135-139 + amp_agent.py:194-206."""
        logits = self._disc_apply(params, disc_in)
        prob = jax.nn.sigmoid(logits)
        r = -jnp.log(jnp.maximum(1.0 - prob, 1e-4))
        return r * self.cfg.disc_reward_scale

    def build_train_data(self, ts: TrainState, traj, key=None):
        """Rewards, TD(λ) returns, normalized advantages, sampler update.

        Ref: add_agent.py:110-133 + ppo_agent.py:111-159 +
        base_agent.py:624-647.
        """
        cfg = self.cfg
        # lean (rollout_lean, non-AMP) trajectories record the demo-agent
        # difference directly; rich ones carry both sides.  The
        # time-aligned windows are captured before any AMP replacement —
        # the adaptive sampler's error signal must measure tracking error
        # against the *aligned* reference, not freshly sampled windows.
        aligned_diff = traj.get("disc_diff")
        if aligned_diff is None:
            aligned_diff = traj["disc_obs_demo"] - traj["disc_obs"]
        if cfg.disc_mode == "amp" and key is not None:
            # AMP fetches fresh demo windows each iteration rather than the
            # time-aligned windows ADD uses (amp_agent.py:73-78)
            T, N = traj["reward"].shape
            demo = self.env.fetch_disc_obs_demo(key, T * N, ts.sampler)
            traj = dict(traj)
            traj["disc_obs_demo"] = demo.reshape(
                (T, N) + demo.shape[1:]
            )
        task_r = traj["reward"]
        disc_in = disc_pos = None
        if cfg.disc_mode == "none":
            disc_r = jnp.zeros_like(task_r)
            r = cfg.task_reward_weight * task_r
        elif cfg.disc_mode == "amp":
            disc_in, disc_pos = self._disc_inputs(
                ts.disc_norm, traj["disc_obs"], traj["disc_obs_demo"]
            )
            disc_r = self._disc_reward_from_input(ts.params, disc_in)
            r = cfg.task_reward_weight * task_r + cfg.disc_reward_weight * disc_r
        else:  # "add": disc input = normalized aligned difference
            disc_in = norm.diff_normalize(ts.disc_norm, aligned_diff)
            disc_r = self._disc_reward_from_input(ts.params, disc_in)
            r = cfg.task_reward_weight * task_r + cfg.disc_reward_weight * disc_r

        # adaptive sampler error update (add_agent.py:117-122)
        diff_sq = jnp.sum(jnp.square(aligned_diff), axis=-1)
        new_sampler = sampler_mod.update_errors(
            ts.sampler, self.env.seg_sizes,
            traj["motion_ids"].reshape(-1), traj["motion_times"].reshape(-1),
            diff_sq.reshape(-1),
        )

        # critic targets.  NOTE (measured, round 3): stacking (obs,
        # next_obs) into one [T, N, 2, d] critic pass costs ~4 ms over two
        # separate passes on v5e — the stack materializes a 314 MB copy
        # that the two fused normalize->matmul passes never form.
        # Lean trajectories (rollout_lean) arrive pre-normalized at the
        # update's consumption dtype; rich ones (rollout — eval/parity
        # harness) carry raw obs.
        if "norm_obs" in traj:
            norm_obs = traj["norm_obs"]
            norm_next = traj["norm_next"]
        else:
            norm_obs = norm.normalize(ts.obs_norm, traj["obs"])
            norm_next = norm.normalize(ts.obs_norm, traj["next_obs"])
        vals = self._ac_apply(ts.params, norm_obs, ADDNet.critic)
        next_vals = self._ac_apply(ts.params, norm_next, ADDNet.critic)
        done = traj["done"]
        next_vals = jnp.where(done == int(DoneFlags.SUCC), 0.0, next_vals)
        next_vals = jnp.where(done == int(DoneFlags.FAIL), 0.0, next_vals)

        ret = td_lambda_return(r, next_vals, done, cfg.discount, cfg.td_lambda)
        adv = ret - vals

        mask = traj["rand_mask"] == 1.0
        cnt = jnp.maximum(jnp.sum(mask), 1.0)
        adv_mean = jnp.sum(adv * mask) / cnt
        adv_var = jnp.sum(jnp.square(adv - adv_mean) * mask) / jnp.maximum(cnt - 1, 1.0)
        adv_std = jnp.sqrt(adv_var)
        norm_adv = (adv - adv_mean) / jnp.maximum(adv_std, 1e-5)
        norm_adv = jnp.clip(norm_adv, -cfg.norm_adv_clip, cfg.norm_adv_clip)

        data = dict(traj)
        data["reward"] = r
        data["tar_val"] = ret
        data["adv"] = norm_adv
        # precomputed update inputs (normalizers are frozen during the
        # update): minibatches gather these directly, skipping per-batch
        # re-normalization and the gather of raw obs/next_obs/disc buffers
        data["norm_obs"] = norm_obs
        # lean trajectories record the normalized action directly (the
        # value log_prob was computed on); rich ones round-trip through
        # the action normalizer like the reference (ppo_agent.py:241)
        data["norm_a"] = (
            traj["norm_a"] if "norm_a" in traj
            else (traj["action"] - self.a_mean) / self.a_std
        )
        if disc_in is not None:
            data["disc_in"] = disc_in
        if disc_pos is not None:
            data["disc_pos"] = disc_pos

        info = dict(
            adv_mean=adv_mean, adv_std=adv_std,
            disc_reward_mean=jnp.mean(disc_r), disc_reward_std=jnp.std(disc_r),
            task_reward_mean=jnp.mean(task_r),
        )
        return replace(ts, sampler=new_sampler), data, info

    # -------------------------------------------------------------- losses

    def _loss(self, params, batch):
        cfg = self.cfg
        norm_obs = batch["norm_obs"]
        norm_a = batch["norm_a"]

        # critic (ppo_agent.py:209-219)
        pred = self._ac_apply(params, norm_obs, ADDNet.critic)
        critic_loss = jnp.mean(jnp.square(batch["tar_val"] - pred))

        # actor on rand-masked samples only (ppo_agent.py:221-275).
        # NOTE (measured, round 2): evaluating actor+critic trunks as one
        # stacked [2,B,i]x[2,i,o] einsum is 13% SLOWER end-to-end than two
        # separate MLP passes on v5e (474K vs 533K env-steps/s) — XLA/MXU
        # prefer the two large dots. Keep them separate.
        mean, logstd = self._ac_apply(params, norm_obs, ADDNet.actor)
        if logstd is None:  # std_type == "fixed"
            logstd = jnp.full_like(mean, self.logstd)
        a_logp = dist.log_prob(mean, logstd, norm_a)
        mask = (batch["rand_mask"] == 1.0).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(mask), 1.0)

        ratio = jnp.exp(a_logp - batch["a_logp"])
        adv = batch["adv"]
        l0 = adv * ratio
        l1 = adv * jnp.clip(ratio, 1.0 - cfg.ppo_clip_ratio, 1.0 + cfg.ppo_clip_ratio)
        actor_loss = -jnp.sum(jnp.minimum(l0, l1) * mask) / cnt

        clip_frac = jnp.sum(
            (jnp.abs(ratio - 1.0) > cfg.ppo_clip_ratio) * mask
        ) / cnt
        imp_ratio = jnp.sum(ratio * mask) / cnt

        # action bound loss on the mode in [-1, 1] (base_agent.py:522-546)
        if cfg.action_bound_weight != 0:
            viol_min = jnp.minimum(mean + 1.0, 0.0)
            viol_max = jnp.maximum(mean - 1.0, 0.0)
            viol = jnp.sum(jnp.square(viol_min), -1) + jnp.sum(jnp.square(viol_max), -1)
            bound_loss = jnp.sum(viol * mask) / cnt
            actor_loss = actor_loss + cfg.action_bound_weight * bound_loss
        else:
            bound_loss = 0.0

        # entropy bonus / action param regularization (ppo_agent.py:262-272;
        # both default to weight 0 in the reference config)
        if cfg.action_entropy_weight != 0:
            ent = jnp.mean(dist.entropy(mean, logstd))
            actor_loss = actor_loss - cfg.action_entropy_weight * ent
        if cfg.action_reg_weight != 0:
            reg = jnp.mean(dist.param_reg(mean))
            actor_loss = actor_loss + cfg.action_reg_weight * reg

        loss = actor_loss + cfg.critic_loss_weight * critic_loss
        info = dict(
            actor_loss=actor_loss, critic_loss=critic_loss,
            clip_frac=clip_frac, imp_ratio=imp_ratio,
            action_bound_loss=bound_loss,
        )

        if cfg.disc_mode != "none":
            disc_loss, disc_info = self._disc_loss(params, batch)
            loss = loss + cfg.disc_loss_weight * disc_loss
            info.update(disc_info)

        info["loss"] = loss
        return loss, info

    def _disc_loss(self, params, batch):
        """Discriminator loss.

        "add" (add_agent.py:141-202): positive = zero difference vector,
        negative = normalized (demo - agent) difference, grad penalty on the
        negative input.
        "amp" (amp_agent.py:98-175): positive = normalized demo obs,
        negative = normalized agent obs, grad penalty on the demo input.
        Both use BCE with 0.9/0.1 label smoothing (amp_agent.py:177-185).
        Inputs arrive pre-normalized from build_train_data; the grad-penalty
        forward is shared with the logit forward via jax.vjp.
        """
        cfg = self.cfg

        def disc_apply(x):
            return self._disc_apply(params, x)

        if cfg.disc_mode == "amp":
            pos_input = batch["disc_pos"]
            neg_input = batch["disc_in"]
            pos_logit, vjp_fn = jax.vjp(disc_apply, pos_input)
            grad_in = vjp_fn(jnp.ones_like(pos_logit))[0]
            neg_logit = disc_apply(neg_input)
        else:
            neg_input = batch["disc_in"]
            pos_input = jnp.zeros((1, neg_input.shape[-1]))
            neg_logit, vjp_fn = jax.vjp(disc_apply, neg_input)
            grad_in = vjp_fn(jnp.ones_like(neg_logit))[0]
            pos_logit = disc_apply(pos_input)
        # the penalty itself is f32 even when the disc trunk is bf16 (the
        # input cotangent of the cast is already f32; this cast covers the
        # case where the batch input arrives pre-cast to bf16)
        grad_in = grad_in.astype(jnp.float32)

        disc_loss_pos = jnp.mean(
            optax.sigmoid_binary_cross_entropy(pos_logit, 0.9 * jnp.ones_like(pos_logit))
        )
        disc_loss_neg = jnp.mean(
            optax.sigmoid_binary_cross_entropy(neg_logit, 0.1 * jnp.ones_like(neg_logit))
        )
        disc_loss = 0.5 * (disc_loss_pos + disc_loss_neg)

        logit_w = params["params"]["disc_logit"]["kernel"]
        disc_loss += cfg.disc_logit_reg * jnp.sum(jnp.square(logit_w))

        if cfg.disc_mode == "amp":
            # AMP penalizes the raw squared gradient magnitude on the demo
            # input (zero-centered, no sqrt — amp_agent.py:131-142)
            grad_penalty = jnp.mean(jnp.sum(jnp.square(grad_in), axis=-1))
        else:
            # ADD penalizes deviation of the gradient norm from 1 on the
            # negative input (add_agent.py:165-178)
            grad_norm = jnp.sqrt(jnp.sum(jnp.square(grad_in), axis=-1) + 1e-8)
            grad_penalty = jnp.mean(jnp.square(grad_norm - 1.0))
        disc_loss += cfg.disc_grad_penalty * grad_penalty

        if cfg.disc_weight_decay != 0:
            wd = sum(
                jnp.sum(jnp.square(params["params"]["disc_trunk"][k]["kernel"]))
                for k in params["params"]["disc_trunk"]
            ) + jnp.sum(jnp.square(logit_w))
            disc_loss += cfg.disc_weight_decay * wd

        info = dict(
            disc_loss=disc_loss,
            disc_grad_penalty=grad_penalty,
            disc_pos_logit=jnp.mean(pos_logit),
            disc_neg_logit=jnp.mean(neg_logit),
            disc_pos_acc=jnp.mean(pos_logit > 0),
            disc_neg_acc=jnp.mean(neg_logit < 0),
        )
        return disc_loss, info

    # --------------------------------------------------------------- update

    def _epoch_scan(self, params, opt_state, flat, key, num_batches,
                    env_count, axis=None):
        """Epoch/minibatch scan over a flat [M, ...] buffer.

        ``env_count`` is the (local) number of envs N behind the time-major
        flat layout (row index = t*N + n); it gates the block shuffle below.
        ``axis`` set = this runs per-device inside shard_map: the buffer is
        the device's LOCAL shard, and gradients/metrics are averaged across
        devices per minibatch (the reference's DDP all-reduce,
        mp_optimizer.py backward semantics).
        """
        cfg = self.cfg
        M = flat["a_logp"].shape[0]
        mb_size = M // num_batches

        # Permute BLOCKS of contiguous rows, not rows (measured, rounds 3-4,
        # tools/profile_gathers.py on v5e at the 131072x8 shape): single-row
        # gathers move one (1, D) sliver per index and ran at ~52 GB/s
        # effective (26.1 ms/update); 8-row blocks are whole sublane tiles
        # (9.7 ms) and 32-row blocks amortize the gather descriptor further
        # (8.0 ms). Each 16384-sample minibatch still mixes 512 randomly
        # drawn blocks. The shuffle stays an unbiased without-replacement
        # partition over independent samples only if a block is 'B adjacent
        # envs at one timestep' (independent episodes), which with
        # time-major rows (t*N+n) requires N % B == 0 — otherwise blocks
        # straddle timesteps of the SAME envs (correlated) and we fall back
        # to smaller blocks / per-row permutation. (A pre-gathered
        # whole-buffer shuffle per epoch was also measured: ~4 ms SLOWER
        # than row gathers — the materialized shuffle is an extra HBM round
        # trip.)
        B = pick_shuffle_block(
            M, num_batches, mb_size, env_count, cfg.minibatch_blocks
        )
        if B > 1:
            flat = {
                k: v.reshape((M // B, B) + v.shape[1:]) for k, v in flat.items()
            }
        nblk = M // B
        mb_blk = mb_size // B

        def epoch_fn(carry, key_e):
            params, opt_state = carry
            perm = jax.random.permutation(key_e, nblk)
            idx = perm[: num_batches * mb_blk].reshape(num_batches, mb_blk)

            def mb_fn(carry, mb_idx):
                params, opt_state = carry
                batch = {
                    k: v[mb_idx].reshape((mb_size,) + v.shape[2:])
                    for k, v in flat.items()
                } if B > 1 else {k: v[mb_idx] for k, v in flat.items()}
                (loss, info), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, batch)
                if axis is not None:
                    # the gradient pmean is the DDP contract and must be
                    # per-minibatch; metrics are averaged once after the
                    # epoch scan (40 scalar-tree collectives -> 1)
                    grads = jax.lax.pmean(grads, axis)
                updates, opt_state = self.optimizer.update(
                    grads, opt_state, params
                )
                params = optax.apply_updates(params, updates)
                return (params, opt_state), info

            # NOTE (measured, round 5): unroll=2 on this scan is NOT a win
            # (850K vs the 849-870K band — within run variance, longer
            # compiles); the per-minibatch loop overhead is not the
            # update's bottleneck
            (params, opt_state), infos = jax.lax.scan(mb_fn, (params, opt_state), idx)
            return (params, opt_state), infos

        keys = jax.random.split(key, cfg.update_epochs)
        (params, opt_state), infos = jax.lax.scan(
            epoch_fn, (params, opt_state), keys
        )
        if axis is not None:
            infos = jax.lax.pmean(infos, axis)
        return (params, opt_state), infos

    def update_model(self, ts: TrainState, data, key):
        """Epoch/minibatch PPO+ADD updates.  Ref: ppo_agent.py:171-192.

        Multi-device (``env.mesh`` set): explicit DDP semantics via
        shard_map — each device permutes and minibatches its LOCAL env
        shard and gradients pmean per minibatch.  Leaving this to GSPMD
        inference instead materializes an all-gather of the whole rollout
        buffer and replicates the entire 5-epoch update on every device
        (verified in compiled HLO — tests/test_scaling_audit.py), which
        would not scale at all.
        """
        cfg = self.cfg
        T, N = data["reward"].shape
        # only the fields the losses consume ride into the minibatch
        # gathers; norm_obs in bf16 under mixed precision halves the
        # dominant gather traffic
        keep = ("norm_obs", "norm_a", "a_logp", "tar_val", "adv",
                "rand_mask", "disc_in", "disc_pos")
        cols = {k: data[k] for k in keep if k in data}
        if cfg.mixed_precision:
            cols["norm_obs"] = cols["norm_obs"].astype(jnp.bfloat16)
        if cfg.disc_mixed_precision:
            # the disc consumes these in bf16 anyway (_disc_apply); casting
            # before the minibatch gathers halves that gather traffic
            for k in ("disc_in", "disc_pos"):
                if k in cols:
                    cols[k] = cols[k].astype(jnp.bfloat16)
        num_batches = int(np.ceil(T / cfg.batch_size))
        mesh = getattr(self.env, "mesh", None)

        if mesh is None:
            flat = {
                k: v.reshape((T * N,) + v.shape[2:]) for k, v in cols.items()
            }
            (params, opt_state), infos = self._epoch_scan(
                ts.params, ts.opt_state, flat, key, num_batches, N
            )
        else:
            from jax.sharding import PartitionSpec as P

            def local_update(params, opt_state, cols, key):
                Tl, Nl = cols["a_logp"].shape
                flat = {
                    k: v.reshape((Tl * Nl,) + v.shape[2:])
                    for k, v in cols.items()
                }
                # per-device shuffle stream (the reference's per-rank
                # ExperienceBuffer permutation)
                key = jax.random.fold_in(key, jax.lax.axis_index("env"))
                return self._epoch_scan(
                    params, opt_state, flat, key, num_batches, Nl, axis="env"
                )

            (params, opt_state), infos = jax.shard_map(
                local_update,
                mesh=mesh,
                in_specs=(P(), P(), P(None, "env"), P()),
                out_specs=((P(), P()), P()),
                check_vma=False,
            )(ts.params, ts.opt_state, cols, key)
        mean_info = jax.tree_util.tree_map(jnp.mean, infos)
        return replace(ts, params=params, opt_state=opt_state), mean_info

    # ------------------------------------------------------------ train iter

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def train_iter(self, ts: TrainState, env_state: EnvState, obs, key):
        """One full training iteration.  Ref: base_agent.py:353-374."""
        cfg = self.cfg
        k_roll, k_data, k_upd = jax.random.split(key, 3)
        env_state, obs, traj, obs_stats = self.rollout_lean(
            ts, env_state, obs, k_roll, cfg.steps_per_iter
        )
        ts, data, data_info = self.build_train_data(ts, traj, k_data)
        ts, train_info = self.update_model(ts, data, k_upd)

        # normalizer updates after the model update (base_agent.py:362-366)
        update_norm = ts.sample_count < cfg.normalizer_samples
        new_obs_norm = norm.update_normalizer_from_stats(
            ts.obs_norm, *obs_stats
        )
        if cfg.disc_mode == "amp":
            # running stats over both agent and demo disc obs (amp_agent.py)
            both = jnp.concatenate([data["disc_obs"], data["disc_obs_demo"]], axis=0)
            new_disc_norm = norm.update_normalizer(ts.disc_norm, both)
        else:
            obs_diff = traj.get("disc_diff")
            if obs_diff is None:
                obs_diff = traj["disc_obs_demo"] - traj["disc_obs"]
            new_disc_norm = norm.update_diff_normalizer(ts.disc_norm, obs_diff)
        ts = replace(
            ts,
            obs_norm=jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_norm, new, old),
                new_obs_norm, ts.obs_norm,
            ),
            disc_norm=jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_norm, new, old),
                new_disc_norm, ts.disc_norm,
            ),
            sample_count=ts.sample_count
            + cfg.steps_per_iter * traj["reward"].shape[1],
        )

        T, N = data["reward"].shape
        info = dict(data_info)
        info.update(train_info)
        info["mean_reward"] = jnp.mean(data["reward"])
        # true mean episode length over episodes that finished this window
        # (the reference's ReturnTracker semantics, base_agent.py:564-621):
        # at each done, env_state.time is exactly the episode's length
        done_mask = (traj["done"] != 0).astype(jnp.float32)
        n_done = jnp.sum(done_mask)
        info["mean_ep_len"] = jnp.sum(
            traj["ep_time"] / self.env.ctrl_dt * done_mask
        ) / jnp.maximum(n_done, 1.0)
        info["done_frac"] = jnp.mean(done_mask)
        info["fail_frac"] = jnp.mean(
            (traj["done"] == int(DoneFlags.FAIL)).astype(jnp.float32)
        )
        return ts, env_state, obs, info

    # ------------------------------------------------------------------ eval

    @partial(jax.jit, static_argnums=(0, 4))
    def eval_rollout(self, ts: TrainState, env_state, obs, num_steps, key):
        """Deterministic (mode action) rollout for eval.

        Returns per-step rewards and done flags; episode statistics are
        computed host-side.  Ref: base_agent.py:393-425 (greedy policy).
        """
        env_state, obs, traj = self.rollout(
            ts, env_state, obs, key, num_steps, train=False
        )
        return env_state, obs, traj["reward"], traj["done"]

    @partial(jax.jit, static_argnums=(0, 4))
    def eval_rollout_states(self, ts: TrainState, env_state, obs, num_steps, key):
        """Deterministic rollout capturing env 0's sim trajectory.

        Used for periodic video recording (the reference's scene-camera
        capture, envs/env.py:85-140 — here: state dump -> offline render).
        Returns (env_state, obs, {root_pos, root_quat, dof_pos} [T, ...]).
        """
        env = self.env

        def step_fn(carry, _):
            env_state, obs, key = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            action, _, _, _ = self._decide_action(
                ts.params, ts.obs_norm, k_act, obs, False
            )
            env_state, _, _, _, _, done = env.step(env_state, action)
            reset_mask = done != int(DoneFlags.NULL)
            env_state = env.reset_where(k_reset, env_state, reset_mask, ts.sampler)
            obs = env.compute_obs(env_state)
            out = dict(
                root_pos=env_state.sim.root_pos[0],
                root_quat=env_state.sim.root_quat[0],
                dof_pos=env_state.sim.dof_pos[0],
                # reference-motion index/time for the ghost overlay render
                motion_id=env_state.motion_ids[0],
                motion_time=env.motion_times(env_state)[0],
            )
            return (env_state, obs, key), out

        (env_state, obs, _), states = jax.lax.scan(
            step_fn, (env_state, obs, key), None, length=num_steps
        )
        return env_state, obs, states


def pick_shuffle_block(M, num_batches, mb_size, env_count,
                       mode: str = "auto") -> int:
    """Largest valid minibatch-shuffle block size (see _epoch_scan).

    "auto": a block of B contiguous time-major rows is 'B adjacent envs
    at one timestep' (independent samples) only when env_count % B == 0,
    and blocks must tile exactly into minibatches.  Candidates ordered by
    measured v5e gather throughput (tools/profile_gathers.py).

    "timestep": block = env_count — each block is one whole timestep, so
    minibatch assembly is batch_size contiguous slab slices instead of
    row gathers.  Falls back to "auto" when timesteps don't tile exactly
    into minibatches.
    """
    if mode == "timestep":
        if M % num_batches == 0 and mb_size % env_count == 0:
            return env_count
        mode = "auto"
    if M % num_batches == 0:
        for cand in (32, 8):
            if mb_size % cand == 0 and env_count % cand == 0:
                return cand
    return 1


def td_lambda_return(r, next_vals, done, discount, td_lambda):
    """TD(λ) return, reverse scan with reset masking.

    Ref: base_agent.py:624-647.
    """
    reset = (done != int(DoneFlags.NULL)).astype(r.dtype)
    last = r[-1] + discount * next_vals[-1]

    def body(next_ret, xs):
        r_t, reset_t, next_v = xs
        lam = td_lambda * (1.0 - reset_t)
        val = r_t + discount * ((1.0 - lam) * next_v + lam * next_ret)
        return val, val

    _, rets = jax.lax.scan(
        body, last, (r[:-1], reset[:-1], next_vals[:-1]), reverse=True
    )
    return jnp.concatenate([rets, last[None]], axis=0)
