"""Pallas megakernel: one TPU kernel per physics control step.

The XLA fused path (physics/fused_step.py) is memory-traffic bound: XLA
materializes inter-fusion intermediates to HBM (~1.1 GB per control step at
4096 envs, ~69 fusions).  This kernel runs the PD slew-limit plus all
``substeps`` substeps of the control step inside a single Pallas program:
every intermediate (body rotations, articulated inertia blocks, bias
forces) lives in VMEM/vector registers, so HBM traffic collapses to the
state in/out (~2 MB).

The substep math is shared 1:1 with the XLA path
(fused_step._substep_core, kernel-safe: constants enter as Python floats),
so parity with physics/engine.py transfers; pinned end-to-end by
tests/test_pallas_step.py.

Grid: 1-D over env blocks.  All arrays enter transposed (env-minor).
Two env layouts:

* 1-D ``[rows, N]`` — vectors [3, N], quats [4, N], dofs [nd, N].  Each
  per-env scalar row is a (1, block) vector = ONE sublane of the 8-sublane
  f32 VPU tile, so the ABA/contact math runs at 1/8 vector throughput.
* 2-D sublane-tiled ``[rows, 8, N/8]`` (``env2d``, auto-on when N is a
  multiple of 1024) — each scalar row is a full (8, 128) tile.  Measured
  4.6x on v5e at 4096 envs (1.55 -> 0.33 ms per control step).  The env
  math is purely elementwise across envs, so the fold is a relabeling;
  parity pinned by tests/test_pallas_mini.py + test_pallas_step.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from add_gym_tpu.physics.engine import EngineParams, SimState
from add_gym_tpu.physics.fused_step import (
    FusedModelConstants,
    _dof_tables,
    _fk_stacked,
    _prep_params,
    _sc_forces_stacked,
    _substep_core,
    compute_np_ext,
    merge_ext,
)

DEFAULT_BLOCK = 512  # lanes per program (multiple of 128)


def pick_block(N: int, cap: int = DEFAULT_BLOCK) -> int:
    """Largest multiple of 128 that divides ``N``, capped at ``cap``.

    Any 128-multiple env count gets a valid block (e.g. 640 -> 128,
    1920 -> 384); counts below 128 run as a single sub-lane block
    (interpret-mode tests).
    """
    if N <= 128:
        return N
    b = min(cap, N)
    b -= b % 128
    while b >= 128 and N % b:
        b -= 128
    if b < 128:
        raise ValueError(
            f"num_envs {N} must be a multiple of 128 for the Pallas physics path"
        )
    return b


def _control_step_kernel(
    fc: FusedModelConstants,
    params: EngineParams,
    use_ms: bool,
    np_bodies: tuple,
    *refs,
):
    (rp_ref, rq_ref, rv_ref, ra_ref, q_ref, qd_ref, prev_tgt_ref, cmd_ref,
     kp_ref, kv_ref, mu_ref, damp_ref, fric_ref, lo_ref, hi_ref) = refs[:15]
    n_in = 15
    ms = None
    if use_ms:
        ms = refs[n_in][:][0]                      # [B] mass/inertia scale
        n_in += 1
    np_rows = None
    if np_bodies:
        # held narrowphase wrenches, 6 rows (torque 3 + force 3) per
        # touched body, evaluated outside the kernel (compute_np_ext) and
        # held constant for the control step — the mass_scale pattern
        np_rows = refs[n_in][:]
        n_in += 1
    (rp_o, rq_o, rv_o, ra_o, q_o, qd_o, tgt_o, contact_o) = refs[n_in:]
    dt = params.ctrl_dt / params.substeps

    rp = rp_ref[:]
    rq = rq_ref[:]
    rv = rv_ref[:]
    ra = ra_ref[:]
    q = q_ref[:]
    qd = qd_ref[:]
    prev_tgt = prev_tgt_ref[:]
    cmd = cmd_ref[:]
    kp = kp_ref[:]
    kv = kv_ref[:]
    mu = mu_ref[:][0]                              # [B]
    tables = (damp_ref[:], fric_ref[:], lo_ref[:], hi_ref[:])

    # PD target clamp + slew limit (engine.apply_pd_target semantics)
    lo = tables[2] + params.position_limit_margin
    hi = tables[3] - params.position_limit_margin
    tgt = jnp.clip(cmd, lo, hi)
    delta = jnp.clip(
        tgt - prev_tgt, -params.max_target_delta, params.max_target_delta
    )
    tgt = prev_tgt + delta

    # held self-collision forces for the whole control step
    sc_ext = None
    if params.self_collision and len(fc.sc_pairs):
        W, o, omega, vel, _ = _fk_stacked(
            fc, rp, rq, rv, ra, qd, jnp.cos(q), jnp.sin(q)
        )
        sc_ext = _sc_forces_stacked(fc, params, dt, W, o, omega, vel)
    if np_rows is not None:
        np_ext = {
            int(b): (np_rows[6 * j: 6 * j + 3], np_rows[6 * j + 3: 6 * j + 6])
            for j, b in enumerate(np_bodies)
        }
        sc_ext = merge_ext(sc_ext, np_ext)

    contact = None
    for _ in range(params.substeps):
        rp, rq, rv, ra, q, qd, contact = _substep_core(
            fc, params, kp, kv, mu, tables, dt, rp, rq, rv, ra, q, qd, tgt,
            sc_ext=sc_ext,
            ms=ms,
        )

    rp_o[:] = rp
    rq_o[:] = rq
    rv_o[:] = rv
    ra_o[:] = ra
    q_o[:] = q
    qd_o[:] = qd
    tgt_o[:] = tgt
    contact_o[:] = contact


def _build_call(fc: FusedModelConstants, params: EngineParams, N: int, block: int,
                interpret: bool = False, use_ms: bool = False,
                np_bodies: tuple = ()):
    """1-D env layout: arrays [rows, N], grid over lane blocks of ``block``."""
    nd = fc.model.nd
    nb = fc.nb
    assert N % block == 0, f"num_envs {N} must be a multiple of block {block}"
    grid = (N // block,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM
        )

    in_specs = [
        spec(3), spec(4), spec(3), spec(3), spec(nd), spec(nd), spec(nd),
        spec(nd), spec(nd), spec(nd), spec(1), spec(nd), spec(nd), spec(nd),
        spec(nd),
    ]
    if use_ms:
        in_specs.append(spec(1))                   # [1, N] mass scale
    if np_bodies:
        in_specs.append(spec(6 * len(np_bodies)))  # held narrowphase wrenches
    out_specs = (
        spec(3), spec(4), spec(3), spec(3), spec(nd), spec(nd), spec(nd),
        spec(nb),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((r, N), jnp.float32)
        for r in (3, 4, 3, 3, nd, nd, nd, nb)
    )
    return pl.pallas_call(
        partial(_control_step_kernel, fc, params, use_ms, np_bodies),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


SUBLANES = 8          # f32 sublane count: rows per env tile in the 2-D layout
LANE_BLOCK = 128      # lanes per program in the 2-D layout


def _build_call_2d(fc: FusedModelConstants, params: EngineParams, N: int,
                   lane_block: int, interpret: bool = False,
                   use_ms: bool = False, np_bodies: tuple = ()):
    """Sublane-tiled env layout: arrays [rows, 8, N/8].

    The 1-D layout maps a per-env scalar row to a (1, block) vector — one
    sublane of the 8-sublane f32 VPU tile, so every elementwise op in the
    ABA/contact chain runs at 1/8 of vector throughput.  Folding the env
    axis to [8, N/8] makes each scalar row a full (8, lane_block) tile.
    The env math is purely elementwise across envs (fused_step helpers
    broadcast over trailing env dims), so the fold is just a relabeling;
    outputs unfold with the inverse reshape.
    """
    nd = fc.model.nd
    nb = fc.nb
    L = N // SUBLANES
    assert L % lane_block == 0
    grid = (L // lane_block,)

    def spec(rows):
        return pl.BlockSpec(
            (rows, SUBLANES, lane_block), lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec(3), spec(4), spec(3), spec(3), spec(nd), spec(nd), spec(nd),
        spec(nd), spec(nd), spec(nd), spec(1), spec(nd), spec(nd), spec(nd),
        spec(nd),
    ]
    if use_ms:
        in_specs.append(spec(1))                   # [1, 8, N/8] mass scale
    if np_bodies:
        in_specs.append(spec(6 * len(np_bodies)))  # held narrowphase wrenches
    out_specs = (
        spec(3), spec(4), spec(3), spec(3), spec(nd), spec(nd), spec(nd),
        spec(nb),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((r, SUBLANES, L), jnp.float32)
        for r in (3, 4, 3, 3, nd, nd, nd, nb)
    )
    return pl.pallas_call(
        partial(_control_step_kernel, fc, params, use_ms, np_bodies),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )


def pallas_step(
    fc: FusedModelConstants,
    params: EngineParams,
    state: SimState,
    pd_target,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    env2d: bool | None = None,
):
    """Control step with the same contract as engine.step / fused_step.

    ``interpret=True`` runs the kernel as plain JAX (for CPU tests).
    ``env2d`` selects the sublane-tiled [rows, 8, N/8] layout (~6x VPU
    throughput on the per-env scalar math); default: on whenever N is a
    multiple of 1024 (full (8, 128) tiles). Both layouts compute the same
    function — the env fold is a pure relabeling.
    """
    N = state.root_pos.shape[0]
    if env2d is None:
        # the sublane-tiled layout needs full (8, 128) tiles per row
        env2d = N % (SUBLANES * LANE_BLOCK) == 0
    block = pick_block(N, cap=block)
    nd = fc.model.nd
    # mass/inertia DR: a per-env (or non-unit / traced) mass_scale enters
    # the kernel as one extra [1, N] input — the ABA blocks are already
    # lifted by scaling a lanes row (_lift_const_mat), so scaling by ms
    # instead of ones is the same op count.  A concrete 1.0 compiles the
    # ms-free kernel (zero cost, the common non-DR case).
    msv = params.mass_scale
    use_ms = not (isinstance(msv, (int, float)) and float(msv) == 1.0)
    # capsule/geom narrowphase (ref capability: arbitrary contacts,
    # mjwarp_engine.py:896-986): the pair tables are constant arrays the
    # kernel cannot hold, so the wrenches are evaluated OUTSIDE the kernel
    # by the fused XLA path (compute_np_ext, same source of truth as
    # fused_step) on the pre-step state and enter as one extra
    # [6 * n_touched, N] input, held constant across the substeps —
    # exactly the fused path's held-wrench semantics and the mass_scale
    # input pattern.  Parity: tests/test_narrowphase.py (kernel case).
    np_ext = compute_np_ext(
        fc, params, params.ctrl_dt / params.substeps, state
    )
    if np_ext is not None:
        np_bodies = tuple(sorted(np_ext))
        np_rows = jnp.concatenate(
            [jnp.concatenate(np_ext[b], axis=0) for b in np_bodies], axis=0
        )                                          # [6 * n_touched, N]
    else:
        np_bodies = ()
        np_rows = None
    kp, kv, mu = _prep_params(fc, params)
    tables = _dof_tables(fc)
    # uniform [nd, N]/[1, N] blocks (broadcast host-side; tiny arrays)
    kp = jnp.broadcast_to(kp, (nd, N))
    kv = jnp.broadcast_to(kv, (nd, N))
    mu = jnp.asarray(mu, jnp.float32)
    mu = jnp.full((1, N), mu) if mu.ndim == 0 else mu.reshape(1, N)
    tables = tuple(jnp.broadcast_to(t, (nd, N)) for t in tables)

    args = [
        state.root_pos.T, state.root_quat.T, state.root_vel.T,
        state.root_ang_vel.T, state.dof_pos.T, state.dof_vel.T,
        state.pd_target.T, pd_target.T, kp, kv, mu, *tables,
    ]
    if use_ms:
        ms = jnp.broadcast_to(
            jnp.asarray(msv, jnp.float32), (N,)
        ).reshape(1, N)
        args.append(ms)
    if np_rows is not None:
        args.append(np_rows)

    if env2d:
        S = SUBLANES
        lane_block = min(LANE_BLOCK, N // S)
        call = _build_call_2d(fc, params, N, lane_block,
                              interpret=interpret, use_ms=use_ms,
                              np_bodies=np_bodies)
        args = [a.reshape(a.shape[0], S, N // S) for a in args]
        outs = call(*args)
        rp, rq, rv, ra, q, qd, tgt, contact = (
            o.reshape(o.shape[0], N) for o in outs
        )
    else:
        call = _build_call(fc, params, N, block, interpret=interpret,
                           use_ms=use_ms, np_bodies=np_bodies)
        rp, rq, rv, ra, q, qd, tgt, contact = call(*args)
    new_state = SimState(
        root_pos=rp.T,
        root_quat=rq.T,
        root_vel=rv.T,
        root_ang_vel=ra.T,
        dof_pos=q.T,
        dof_vel=qd.T,
        pd_target=tgt.T,
    )
    return new_state, contact.T


def sharded_pallas_step(
    fc: FusedModelConstants,
    mesh,
    params: EngineParams,
    state: SimState,
    pd_target,
    axis: str = "env",
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    env2d: bool | None = None,
):
    """Pallas control step under an env-sharded mesh.

    Pallas programs are opaque to GSPMD, so the kernel is wrapped in
    shard_map over the ``env`` axis: each device runs the kernel on its
    local env shard (physics is embarrassingly parallel across envs —
    SURVEY.md §2.7).  Per-env DR params (leading dim == num_envs: [N, nd]
    gains, [N] friction/mass_scale) shard along the env axis like the
    state; shared ([nd]/scalar) leaves replicate.
    """
    from jax.sharding import PartitionSpec as P

    num_envs = state.root_pos.shape[0]

    def leaf_spec(x):
        # per-env leaves have the env axis leading; model-shared leaves
        # ([nd] gains, scalars) replicate.  nd == num_envs cannot collide:
        # env counts are 128-multiples (pick_block), dof counts are not.
        if jnp.ndim(x) >= 1 and jnp.shape(x)[0] == num_envs:
            return P(axis)
        return P()

    params_spec = jax.tree_util.tree_map(leaf_spec, params)
    has_per_env = any(
        s != P() for s in jax.tree_util.tree_leaves(
            params_spec, is_leaf=lambda x: isinstance(x, P)
        )
    )
    state_spec = jax.tree_util.tree_map(lambda _: P(axis), state)

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation, and the kernel is purely per-shard (no collectives)
    if not has_per_env:
        # shared params stay closure-captured: a concrete mass_scale == 1.0
        # keeps the ms-free kernel (pallas_step use_ms)
        def local_step(state, pd_target):
            return pallas_step(
                fc, params, state, pd_target, block=block,
                interpret=interpret, env2d=env2d,
            )

        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_spec, P(axis)),
            out_specs=(state_spec, P(axis)),
            check_vma=False,
        )(state, pd_target)

    def local_step(params, state, pd_target):
        return pallas_step(
            fc, params, state, pd_target, block=block, interpret=interpret,
            env2d=env2d,
        )

    return jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(params_spec, state_spec, P(axis)),
        out_specs=(state_spec, P(axis)),
        check_vma=False,
    )(params, state, pd_target)
