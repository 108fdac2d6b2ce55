"""Export a trained checkpoint as a publishable model artifact.

Counterpart of the reference's ``publish/push_to_hf.py`` (push_to_hf.py:
28-196): strips the optimizer state from a training checkpoint and writes a
self-contained model directory — weights (flax msgpack), normalizer
statistics, the composed config, and a generated model card.  Uploading to
a model hub is a separate step (the artifact directory is hub-ready); this
tool never performs network calls.

Usage:
    python -m add_gym_tpu.cli.publish logs/run1/checkpoint out_dir/ \
        [--config logs/run1/config.json] [--name my-g1-add]
"""

from __future__ import annotations

import argparse
import json
import os

MODEL_CARD = """\
---
license: mit
library_name: jax
tags:
  - reinforcement-learning
  - locomotion
  - robotics
  - g1
---

# {name}

A Unitree G1 (29-DOF) humanoid motion-imitation policy trained with
PPO + an adversarial differential discriminator (ADD) on the
`add_gym_tpu` TPU-native framework.

- actor/critic: `{actor_net}` / `{critic_net}` MLPs
- discriminator: `{disc_net}` MLP over observation-difference histories
- training samples: {sample_count}
- observation dim: {obs_dim}; action dim: {action_dim}

## Files

- `model.msgpack` — flax parameter tree (actor + critic + discriminator)
- `normalizers.msgpack` — running observation / diff normalizer statistics
- `config.json` — full composed training config
- `metadata.json` — shapes and training counters

## Usage

```python
import flax.serialization, json
from add_gym_tpu.utils.config import load_config
from add_gym_tpu.builder import build_env, build_agent

cfg = json.load(open("config.json"))
env = build_env(cfg)
agent = build_agent(cfg, env)
ts = agent.init_train_state()
params = flax.serialization.from_bytes(
    ts.params, open("model.msgpack", "rb").read())
```
"""


def export(checkpoint: str, out_dir: str, config_path: str | None, name: str):
    import jax
    import flax.serialization
    import orbax.checkpoint as ocp

    cfg = {}
    if config_path is None:
        cand = os.path.join(os.path.dirname(os.path.abspath(checkpoint)), "config.json")
        config_path = cand if os.path.exists(cand) else None
    if config_path:
        with open(config_path) as f:
            cfg = json.load(f)

    from add_gym_tpu.builder import build_env, build_agent

    # only the train-state *structure* matters for restore; a small env
    # batch keeps this cheap (the motion set must match for sampler shapes).
    # Work on a copy so the artifact's config.json records the *training*
    # num_envs, not the structural-build override.
    import copy

    build_cfg = copy.deepcopy(cfg)
    build_cfg.setdefault("engine", {})["num_envs"] = 8
    env = build_env(build_cfg)
    agent = build_agent(build_cfg, env)
    ts = agent.init_train_state()

    ckpter = ocp.StandardCheckpointer()
    payload = ckpter.restore(
        os.path.abspath(checkpoint),
        target={"train_state": jax.device_get(ts), "iter": 0},
    )
    ts = payload["train_state"]

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(ts.params)))
    import dataclasses

    def as_plain(x):
        # registered-dataclass pytrees (NormState/DiffNormState) -> dicts
        d = dataclasses.asdict(jax.device_get(x))
        return {k: v for k, v in d.items() if not isinstance(v, float)} | {
            k: float(v) for k, v in d.items() if isinstance(v, float)
        }

    with open(os.path.join(out_dir, "normalizers.msgpack"), "wb") as f:
        f.write(
            flax.serialization.to_bytes(
                {
                    "obs_norm": as_plain(ts.obs_norm),
                    "disc_norm": as_plain(ts.disc_norm),
                }
            )
        )
    if cfg:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)

    agent_cfg = cfg.get("agent", {})
    meta = {
        "name": name,
        "iter": int(payload["iter"]),
        "sample_count": int(ts.sample_count),
        "obs_dim": env.obs_dim(),
        "disc_obs_dim": env.disc_obs_dim(),
        "action_dim": env.num_dofs,
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(out_dir, "README.md"), "w") as f:
        f.write(
            MODEL_CARD.format(
                name=name,
                actor_net=agent_cfg.get("actor_net", "fc_3layers_1024units"),
                critic_net=agent_cfg.get("critic_net", "fc_3layers_1024units"),
                disc_net=agent_cfg.get("disc_net", "fc_2layers_1024units"),
                sample_count=meta["sample_count"],
                obs_dim=meta["obs_dim"],
                action_dim=meta["action_dim"],
            )
        )
    print(f"exported {checkpoint} -> {out_dir}")


def push_to_hf(out_dir: str, repo_id: str, private: bool = False) -> str:
    """Upload the exported artifact to the Hugging Face Hub.

    Mirrors the reference's push contract (push_to_hf.py:170-196): create
    the repo if missing (idempotent re-push), upload the whole artifact
    folder — strip-optimizer + model card already happened in :func:`export`.
    Requires ``HF_TOKEN`` (or a cached login) with write access.
    """
    import json as _json

    from huggingface_hub import HfApi

    api = HfApi()
    api.create_repo(
        repo_id=repo_id, repo_type="model", private=private, exist_ok=True
    )
    meta_path = os.path.join(out_dir, "metadata.json")
    it = "?"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            it = _json.load(f).get("iter", "?")
    api.upload_folder(
        repo_id=repo_id,
        folder_path=out_dir,
        repo_type="model",
        commit_message=f"Update checkpoint (iter {it})",
    )
    url = f"https://huggingface.co/{repo_id}"
    print(f"pushed {out_dir} -> {url}")
    return url


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="orbax checkpoint directory (Trainer.save)")
    ap.add_argument("out_dir")
    ap.add_argument("--config", default=None, help="config.json from the run dir")
    ap.add_argument("--name", default="add-gym-tpu-g1")
    ap.add_argument(
        "--push", default=None, metavar="URI",
        help="also upload the artifact: hf://org/repo (Hugging Face Hub, "
             "the reference's push_to_hf.py contract) or gs:// | s3:// | "
             "file:// bucket upload",
    )
    ap.add_argument(
        "--private", action="store_true",
        help="create the HF repo as private (first creation only)",
    )
    args = ap.parse_args(argv)
    export(args.checkpoint, args.out_dir, args.config, args.name)
    if args.push:
        if args.push.startswith("hf://"):
            push_to_hf(args.out_dir, args.push[len("hf://"):], args.private)
        else:
            from add_gym_tpu.utils.remote import push_dir

            push_dir(args.out_dir, args.push)


if __name__ == "__main__":
    main()
