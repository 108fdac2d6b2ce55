"""Worker for the 2-process jax.distributed integration test.

Launched as a subprocess by tests/test_distributed.py:

    python distributed_worker.py <process_id> <num_processes> <port> <outdir>

Each process owns 4 virtual CPU devices (8 global), rendezvous over a
local TCP coordinator — the process-level analog of the reference's
torchrun c10d bootstrap (sagemaker-entrypoint.sh:103-140) — then runs a
tiny Trainer end-to-end: global-mesh train_iter, proc-0 checkpoint save,
all-process resume.  Results (param hash, counters) are dumped to JSON
for the parent to cross-check.
"""

import json
import os
import sys


def main():
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = int(sys.argv[3])
    outdir = sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    # per-process compile cache: both procs compile the same graphs, and
    # concurrent same-key writes to one cache dir have corrupted entries
    # on this box before (then later runs SIGSEGV deserializing them)
    base = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/jax_comp_tests"),
    )
    os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        base, f"dw{process_id}"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
    jax.config.update("jax_disable_most_optimizations", True)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * num_processes

    import numpy as np
    from jax.experimental import multihost_utils

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from add_gym_tpu.learning.runner import Trainer
    from add_gym_tpu.utils.config import load_config

    cfg = load_config("train")
    cfg["engine"]["num_envs"] = 8
    cfg["engine"]["fused"] = False
    cfg["task"]["motion_file"] = "motions/walk1_subject1.motion"
    cfg["agent"]["steps_per_iter"] = 4
    cfg["agent"]["update_epochs"] = 1
    cfg["agent"]["batch_size"] = 2
    cfg["agent"]["actor_net"] = "fc_2layers_64units"
    cfg["agent"]["critic_net"] = "fc_2layers_64units"
    cfg["agent"]["disc_net"] = "fc_2layers_64units"
    cfg["log_dir"] = outdir
    cfg["experiment_name"] = "dist_exp"
    cfg["test_episodes"] = 0
    cfg["iters_per_output"] = 1000  # no mid-run saves/videos
    cfg["metrics_every"] = 1

    # run 1: two iterations, final proc-0 save
    t1 = Trainer(cfg)
    assert t1.mesh is not None and t1.mesh.devices.size == 4 * num_processes
    t1.train(max_iters=2)
    samples_run1 = int(jax.device_get(t1.ts.sample_count))
    ts_saved = jax.device_get(t1.ts)  # local copy of the state that was saved

    # every process must see the checkpoint before anyone resumes
    multihost_utils.sync_global_devices("ckpt_written")

    # run 2: fresh Trainer auto-resumes from the experiment dir (all-load).
    # The reference's contract is EXACT resumption (main.py:92-105 +
    # base_agent.py:148-208): the restored train state must be bitwise
    # identical to the state run 1 saved — params, optimizer moments,
    # normalizer statistics, sampler table, counters.
    t2 = Trainer(cfg)
    resumed_iter = t2.iter
    samples_resumed = int(jax.device_get(t2.ts.sample_count))
    ts_resumed = jax.device_get(t2.ts)
    saved_leaves = jax.tree_util.tree_leaves(ts_saved)
    resumed_leaves = jax.tree_util.tree_leaves(ts_resumed)
    assert len(saved_leaves) == len(resumed_leaves)
    resume_bitwise = all(
        a.dtype == b.dtype and a.shape == b.shape
        and np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(saved_leaves, resumed_leaves)
    )
    t2.train(max_iters=3)  # one more iteration on top of the resumed state

    # the replicated params must be bitwise identical across processes —
    # fetch the local copy and hash it
    leaves = jax.tree_util.tree_leaves(jax.device_get(t2.ts.params))
    h = 0.0
    for leaf in leaves:
        h += float(np.sum(np.abs(np.asarray(leaf, np.float64))))

    result = dict(
        process_id=process_id,
        process_count=jax.process_count(),
        samples_run1=samples_run1,
        resumed_iter=resumed_iter,
        samples_resumed=samples_resumed,
        samples_final=int(jax.device_get(t2.ts.sample_count)),
        params_hash=h,
        resume_bitwise=resume_bitwise,
    )
    with open(os.path.join(outdir, f"result_{process_id}.json"), "w") as f:
        json.dump(result, f)
    multihost_utils.sync_global_devices("done")
    print(f"worker {process_id} ok: {result}")


if __name__ == "__main__":
    main()
