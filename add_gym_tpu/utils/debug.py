"""Debug / sanitizer utilities (SURVEY.md §5.2 analog).

The reference ships no sanitizers — only operational workarounds for known
races (TI_OFFLINE_CACHE=0, NCCL P2P disables, a NaN guard before the
viewer's mj_forward).  Here the functional design removes that class of
bug, and this module provides the two knobs the survey called for:
``jax_debug_nans`` wiring lives in cli/train.py (``debug.nans=true``);
``parity_check`` below is the cross-backend "sanity mode"
(``debug.parity_check=true``).
"""

from __future__ import annotations

import numpy as np


def parity_check(env, n: int = 4, atol: float = 5e-4, steps: int = 3):
    """Assert the env's selected physics backend matches the readable
    reference-layout engine on a short random rollout.

    Runs at startup (before training) so a mis-specified model/DR config
    fails loudly with the offending field, not as silent training garbage.
    Skipped automatically when the env already runs the reference path.
    """
    import jax
    import jax.numpy as jnp
    from dataclasses import replace

    from add_gym_tpu.physics import engine as eng

    if not (env.fused or env.pallas):
        print("parity_check: env already uses the reference-layout engine")
        return

    model = env.model
    params = env.params
    s_sel = eng.default_state(model, n)
    key = jax.random.PRNGKey(0)
    s_sel = replace(
        s_sel,
        root_pos=s_sel.root_pos.at[:, 2].set(1.0),
        dof_vel=0.1 * jax.random.normal(key, s_sel.dof_vel.shape),
    )
    s_ref = s_sel
    step_ref = jax.jit(lambda s, t: eng.step(model, params, s, t))
    step_sel = jax.jit(lambda s, t: env._step_fn(params, s, t))
    for i in range(steps):
        tgt = 0.05 * jax.random.normal(
            jax.random.fold_in(key, i), (n, model.nd)
        )
        s_sel, _ = step_sel(s_sel, tgt)
        s_ref, _ = step_ref(s_ref, tgt)
    for name in ("root_pos", "root_quat", "dof_pos", "dof_vel"):
        a = np.asarray(getattr(s_sel, name))
        b = np.asarray(getattr(s_ref, name))
        err = np.abs(a - b).max()
        assert err < atol, (
            f"physics parity check FAILED: {name} diverges by {err:.2e} "
            f"between the selected backend and the reference-layout engine"
        )
    print(f"parity_check: selected backend matches reference engine "
          f"({steps} steps, {n} envs, atol {atol})")
