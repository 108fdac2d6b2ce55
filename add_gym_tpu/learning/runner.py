"""Host-side training orchestration: loop, eval, checkpoints, auto-resume.

Equivalent of the reference's ``BaseAgent.train_model`` / ``test_model``
host loop (base_agent.py:79-126) plus the checkpoint/spot-resume contract
(SURVEY.md §5.4): periodic saves of {train_state, iter} with automatic
resume from the latest checkpoint in the experiment directory.
"""

from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from add_gym_tpu.builder import build_agent, build_env
from add_gym_tpu.envs.done import DoneFlags
from add_gym_tpu.parallel.mesh import make_mesh, replicate_tree, shard_env_tree
from add_gym_tpu.utils.logger import TrainLogger


def episode_stats(rewards: np.ndarray, dones: np.ndarray):
    """Per-episode return / length statistics from time-major buffers.

    Mirrors ReturnTracker (base_agent.py:564-621): returns accumulate per
    env and flush at each done.
    """
    T, N = rewards.shape
    ret = np.zeros(N)
    length = np.zeros(N, np.int64)
    ep_returns, ep_lens = [], []
    for t in range(T):
        ret += rewards[t]
        length += 1
        done = dones[t] != int(DoneFlags.NULL)
        if done.any():
            ep_returns.extend(ret[done].tolist())
            ep_lens.extend(length[done].tolist())
            ret[done] = 0.0
            length[done] = 0
    return ep_returns, ep_lens


class Trainer:
    def __init__(self, cfg: Dict, use_mesh: bool = True):
        self.cfg = cfg
        self.mesh = None
        if use_mesh and len(jax.devices()) > 1:
            self.mesh = make_mesh()
        self.env = build_env(cfg, mesh=self.mesh)
        self.agent = build_agent(cfg, self.env)
        self.num_envs = int(cfg.get("engine", {}).get("num_envs", 256))
        # run-length keys live at the top level here, but the reference
        # keeps them in the agent group (configs/agent/add_g1.yaml:17-18,41)
        # — accept both spellings so reference-style overrides
        # (``agent.max_samples=...``) are not silently ignored
        agent_cfg = cfg.get("agent", {}) or {}

        def _run_key(key, default):
            return agent_cfg.get(key, cfg.get(key, default))

        self.iters_per_output = int(_run_key("iters_per_output", 100))
        self.test_episodes = int(_run_key("test_episodes", 10))
        self.max_samples = int(_run_key("max_samples", 10**14))
        self.exp_dir = os.path.join(
            cfg.get("log_dir", "logs/"), cfg.get("experiment_name", "exp")
        )
        self.logger = TrainLogger(self.exp_dir)
        self.iter = 0

        seed = int(cfg.get("seed", 0))
        # host RNG stream lives on the CPU backend: eager key ops through a
        # remote-TPU tunnel cost ~100x and a per-iteration split would
        # serialize the async dispatch pipeline
        try:
            self._cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            # no CPU backend (e.g. JAX_PLATFORMS=tpu): key ops fall back to
            # the default device — slower through a remote tunnel, not fatal
            self._cpu = jax.local_devices()[0]
        with jax.default_device(self._cpu):
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed), jax.process_index()
            )
        self._key = key

        # jitted reset-all (init + eval entry): eager per-op dispatch of the
        # reset graph through a remote-TPU tunnel costs seconds
        def _reset_all(k, es, sampler):
            es = self.env.reset_where(
                k, es, jnp.ones(self.num_envs, bool), sampler
            )
            return es, self.env.compute_obs(es)

        self._reset_all = jax.jit(_reset_all)

        ts = self.agent.init_train_state()
        es = self.env.init_state(self.num_envs)
        k0 = self._next_key()
        es, obs = self._reset_all(k0, es, ts.sampler)

        if self.mesh is not None:
            ts = replicate_tree(self.mesh, ts)
            es = shard_env_tree(self.mesh, es)
            obs = shard_env_tree(self.mesh, obs)
        self.ts, self.es, self.obs = ts, es, obs

        self._maybe_resume()

    def _next_key(self):
        with jax.default_device(self._cpu):
            k, self._key = jax.random.split(self._key)
        return k

    # ------------------------------------------------------------ checkpoint

    def _ckpt_dir(self):
        return os.path.abspath(os.path.join(self.exp_dir, "checkpoint"))

    def save(self, path=None, numbered: bool = False):
        """Save {train_state, iter} — the reference's rank-0 torch.save
        (base_agent.py:548-561) in orbax form: ALL processes call save
        (orbax runs a cross-process barrier internally, so a rank-gated
        call deadlocks a pod — caught by tests/test_distributed.py) and
        orbax writes files from the primary host only.

        ``numbered`` also writes an immutable snapshot under
        ``intermediate_outputs/`` (reference: model_%010d.pt).
        """
        import orbax.checkpoint as ocp

        path = path or self._ckpt_dir()
        ckpter = ocp.StandardCheckpointer()
        payload = {
            "train_state": jax.device_get(self.ts),
            "iter": self.iter,
        }
        ckpter.save(path, payload, force=True)
        if numbered:
            samples = int(payload["train_state"].sample_count)
            snap = os.path.abspath(
                os.path.join(
                    self.exp_dir, "intermediate_outputs", f"model_{samples:012d}"
                )
            )
            ckpter.save(snap, payload, force=True)
        ckpter.wait_until_finished()

    def load(self, path):
        import orbax.checkpoint as ocp

        ckpter = ocp.StandardCheckpointer()
        target = {"train_state": jax.device_get(self.ts), "iter": 0}
        try:
            payload = ckpter.restore(path, target=target)
        except Exception as primary_err:
            payload = self._restore_migrating_opt_state(
                ckpter, path, target, primary_err
            )
        ts = payload["train_state"]
        if self.mesh is not None:
            ts = replicate_tree(self.mesh, ts)
        self.ts = ts
        self.iter = int(payload["iter"])

    def _restore_migrating_opt_state(self, ckpter, path, target, primary_err):
        """Restore a checkpoint saved under a different optimizer config.

        The adam-family optimizers ("adam" optax chain vs "fused_adam",
        configs/agent/add_g1.yaml) carry identical moments in different
        opt_state tree shapes; a checkpoint saved under one would otherwise
        crash orbax's structure match when loaded under the other (spot
        auto-resume after a config change, or resume_path of an older
        flagship checkpoint).  Retries the restore with each alternate
        opt_state shape and converts the moments 1:1.
        """
        from dataclasses import replace as dc_replace

        from add_gym_tpu.learning.optim import (
            extract_adam_moments, inject_adam_moments,
        )

        ts_t = target["train_state"]
        active_template = jax.device_get(self.agent.optimizer.init(ts_t.params))
        for name, alt in self.agent.alternate_opt_templates(ts_t.params):
            alt_target = {
                "train_state": dc_replace(ts_t, opt_state=jax.device_get(alt)),
                "iter": 0,
            }
            try:
                payload = ckpter.restore(path, target=alt_target)
            except Exception:
                continue
            restored = payload["train_state"]
            migrated = inject_adam_moments(
                active_template, *extract_adam_moments(restored.opt_state)
            )
            print(
                f"Migrated checkpoint opt_state from '{name}' to "
                f"'{self.agent.cfg.optimizer}' (adam moments mapped 1:1)"
            )
            payload["train_state"] = dc_replace(restored, opt_state=migrated)
            return payload
        raise ValueError(
            f"checkpoint at {path} does not match the configured optimizer "
            f"'{self.agent.cfg.optimizer}' and no adam-family migration "
            f"applies; set agent.optimizer to the config the checkpoint was "
            f"saved with (original error: {primary_err})"
        ) from primary_err

    def _maybe_resume(self):
        """Auto-resume for spot restarts, else explicit resume_path.

        Mirrors the reference's precedence (main.py:92-105): a checkpoint
        already in the experiment dir wins (spot restart); otherwise a
        configured ``resume_path`` — local, gs://, s3:// or file:// — is
        fetched and loaded as the starting point.
        """
        path = self._ckpt_dir()
        if os.path.isdir(path):
            self.load(path)
            print(f"Resumed from {path} at iter {self.iter}")
            return
        resume = self.cfg.get("resume_path")
        if resume:
            from add_gym_tpu.utils.remote import fetch_dir

            local = fetch_dir(str(resume))
            self.load(local)
            print(f"Resuming from resume_path {resume} at iter {self.iter}")

    # ---------------------------------------------------------------- train

    def train(self, max_iters: int | None = None):
        start = time.time()
        test_info = {}
        samples_per_iter = self.agent.cfg.steps_per_iter * self.num_envs
        # metrics_every > 1 skips the per-iteration host transfer of the
        # info dict: on a remote-TPU tunnel that round trip serializes the
        # async dispatch pipeline (several times the iteration cost).
        # Logging/NaN-detection then happen every Nth iteration.
        metrics_every = max(1, int(self.cfg.get("metrics_every", 1)))
        # optional device profiling window (SURVEY.md §5.1: the reference has
        # no tracing; here jax.profiler captures iters [start, start+count))
        prof = self.cfg.get("profile", {}) or {}
        prof_start = int(prof.get("start_iter", 10)) if prof else -1
        prof_count = int(prof.get("num_iters", 3)) if prof else 0

        # track sample count host-side (one sync at entry, none per iter)
        samples = int(jax.device_get(self.ts.sample_count))
        t_block = time.time()
        last_metrics_iter = self.iter - 1
        while samples < self.max_samples:
            if max_iters is not None and self.iter >= max_iters:
                break
            output_iter = self.iter % self.iters_per_output == 0
            metrics_iter = output_iter or self.iter % metrics_every == 0

            if output_iter and self.test_episodes > 0:
                test_info = self.evaluate(self.test_episodes)

            if prof_count and self.iter == prof_start:
                jax.profiler.start_trace(
                    prof.get("dir", os.path.join(self.exp_dir, "profile"))
                )

            t_iter = time.time()
            k = self._next_key()
            self.ts, self.es, self.obs, info = self.agent.train_iter(
                self.ts, self.es, self.obs, k
            )
            samples += samples_per_iter

            if prof_count and self.iter == prof_start + prof_count - 1:
                jax.profiler.stop_trace()

            if not metrics_iter:
                self.iter += 1
                continue
            metrics = {k2: float(v) for k2, v in jax.device_get(info).items()}
            # amortized per-iteration rate since the last metrics fetch (the
            # async dispatch queue hides individual iteration boundaries)
            span = max(self.iter - last_metrics_iter, 1)
            last_metrics_iter = self.iter
            iter_s = (
                (time.time() - t_block) / span
                if metrics_every > 1 else time.time() - t_iter
            )
            t_block = time.time()

            # failure detection: a non-finite loss means the run is lost —
            # save a post-mortem checkpoint and stop loudly rather than
            # silently training on garbage
            if not np.isfinite(metrics.get("loss", 0.0)):
                self.save(os.path.abspath(os.path.join(self.exp_dir, "crash")))
                raise FloatingPointError(
                    f"non-finite loss at iter {self.iter}: {metrics}"
                )

            metrics["wall_hours"] = (time.time() - start) / 3600.0
            metrics["iter_seconds"] = iter_s
            metrics["env_steps_per_s"] = samples_per_iter / max(iter_s, 1e-9)
            for k2, v in test_info.items():
                metrics[f"test_{k2}"] = v
            self.logger.log(metrics, int(jax.device_get(self.ts.sample_count)))

            if output_iter:
                self.save(numbered=self.cfg.get("save_intermediate", False))
                self.logger.log_sampler_image(
                    jax.device_get(self.ts.sampler.errors),
                    int(jax.device_get(self.ts.sample_count)),
                )
                vid_every = int(self.cfg.get("video_interval", 0) or 0)
                if vid_every and (self.iter // self.iters_per_output) % vid_every == 0:
                    # all processes participate (the rollout is a global jitted
                    # computation and the key split must stay in lockstep);
                    # only the host-side render/save is rank-0-gated inside
                    self.record_video(
                        os.path.join(self.exp_dir, f"rollout_{self.iter:07d}.gif")
                    )
            self.iter += 1
        self.save()

    # ----------------------------------------------------------------- video

    def record_video(self, path: str, seconds: float = 4.0):
        """Greedy rollout of env 0 -> stick-figure video + pose npz.

        The reference records MP4s from a scene camera during training
        (envs/env.py:85-140); on TPU we dump sim states and render offline
        with the viewer machinery (cli/view.py).
        """
        from add_gym_tpu.cli.view import render_video
        from add_gym_tpu.kinematics.char_model import load_char_model

        steps = int(seconds / self.env.ctrl_dt)
        k = self._next_key()
        self.es, self.obs, states = self.agent.eval_rollout_states(
            self.ts, self.es, self.obs, steps, k
        )
        if self.mesh is not None:
            # replicate the (tiny, env-0-only) trajectory so it is fully
            # addressable from every process before the host transfer — a
            # collective, so it must run on all processes
            from jax.sharding import NamedSharding, PartitionSpec as P

            states = jax.jit(
                lambda s: s, out_shardings=NamedSharding(self.mesh, P())
            )(states)
        states = jax.device_get(states)
        if jax.process_index() != 0:
            return
        char = getattr(self.env, "_char", None)
        if char is None:
            from add_gym_tpu.utils.assets import asset_path

            char = load_char_model(asset_path("g1_description/g1_29.xml"))
        import jax.numpy as _jnp

        joint_rot = char.dof_to_rot(_jnp.asarray(states["dof_pos"]))
        body_pos, body_rot = char.forward_kinematics(
            _jnp.asarray(states["root_pos"]),
            _jnp.asarray(states["root_quat"]),
            joint_rot,
        )
        # ghost = the reference motion the agent is imitating, at the same
        # times (the reference's non-colliding ghost entity, robot.py:48-57)
        rp, rq, _, _, dp, _ = self.env.motion.get_motion_step(
            _jnp.asarray(states["motion_id"]),
            _jnp.asarray(states["motion_time"]),
        )
        ghost_pos, ghost_rot = char.forward_kinematics(
            rp, rq, char.dof_to_rot(dp)
        )
        np.savez_compressed(
            path + ".npz",
            body_pos=np.asarray(body_pos),
            body_rot=np.asarray(body_rot),
            ghost_body_pos=np.asarray(ghost_pos),
            ghost_body_rot=np.asarray(ghost_rot),
            body_names=np.asarray(char.body_names),
            parents=char.parent_indices,
        )
        try:
            from add_gym_tpu.render.mesh import (
                RobotMeshModel, render_frames, save_video,
            )
            from add_gym_tpu.utils.assets import asset_path

            mm = RobotMeshModel(
                asset_path("g1_description/g1_29.xml"), list(char.body_names)
            )
            frames = render_frames(
                mm, np.asarray(body_pos), np.asarray(body_rot),
                np.asarray(ghost_pos), np.asarray(ghost_rot),
            )
            save_video(frames, path, fps=1.0 / self.env.ctrl_dt)
        except Exception as e:  # rendering must never kill training
            print(f"mesh render failed ({e}); falling back to stick figure")
            try:
                render_video(
                    char, np.asarray(body_pos), path, fps=1.0 / self.env.ctrl_dt
                )
            except Exception as e2:
                print(f"video render failed: {e2}")

    # ----------------------------------------------------------------- eval

    def evaluate(self, num_episodes: int) -> Dict:
        """Greedy-policy evaluation.  Ref: base_agent.py:116-126,393-425.

        Resets ALL envs at entry (the reference's ``test_model`` calls
        ``_reset_envs()`` with no ids, base_agent.py:399-403) so every
        counted episode starts fresh — statistics are invariant to the
        training state this interrupts — then rolls deterministically until
        every env has finished at least ceil(num_episodes / num_envs)
        episodes (or an episode-length cap).  Episodes still in progress at
        the cap are dropped (``episode_stats`` flushes only at dones).

        By default the post-eval env state carries into the next train
        iteration, exactly like the reference (train_model continues from
        post-test state, base_agent.py:93-95).  ``eval_isolated: true``
        instead restores the pre-eval training state afterwards — the
        round-5 attribution study (docs/TRAINING.md) measured that the
        reference's carry-over semantics visibly costs sample efficiency
        under frequent/heavy eval (every eval leaves ALL envs synchronized
        early-episode, skewing the on-policy data distribution).  With a
        stateful GPU engine, snapshotting the simulator is expensive; here
        the entire environment is one device pytree, so isolation is a
        reference copy (tests/test_runner_eval.py::test_eval_isolated_*).
        """
        isolated = bool(self.cfg.get("eval_isolated", False))
        if isolated:
            es_saved, obs_saved = self.es, self.obs
        min_eps = int(np.ceil(num_episodes / self.num_envs))
        max_ep_steps = int(
            self.env.task.max_episode_length / self.env.ctrl_dt
        )
        # chunk sized to the episode cap: at small env counts a fixed 256
        # would grossly overshoot short-episode evals
        chunk = max(1, min(256, max_ep_steps))
        max_steps = min_eps * max_ep_steps + chunk
        k0 = self._next_key()
        es, obs = self._reset_all(k0, self.es, self.ts.sampler)

        all_r, all_d = [], []
        eps_per_env = np.zeros(self.num_envs, np.int64)
        steps = 0
        while steps < max_steps and not (eps_per_env >= min_eps).all():
            k = self._next_key()
            es, obs, r, d = self.agent.eval_rollout(self.ts, es, obs, chunk, k)
            r = np.asarray(jax.device_get(r))
            d = np.asarray(jax.device_get(d))
            all_r.append(r)
            all_d.append(d)
            eps_per_env += (d != int(DoneFlags.NULL)).sum(axis=0)
            steps += chunk

        rewards = np.concatenate(all_r, axis=0)
        dones = np.concatenate(all_d, axis=0)
        ep_returns, ep_lens = episode_stats(rewards, dones)
        if isolated:
            self.es, self.obs = es_saved, obs_saved
        else:
            self.es, self.obs = es, obs
        if not ep_returns:
            return {"mean_return": 0.0, "mean_ep_len": float(steps), "num_eps": 0}
        return {
            "mean_return": float(np.mean(ep_returns)),
            "mean_ep_len": float(np.mean(ep_lens)),
            "num_eps": len(ep_returns),
        }
