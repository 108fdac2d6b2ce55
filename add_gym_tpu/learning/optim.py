"""Fused gradient-clip + Adam optimizer.

Functionally identical to ``optax.chain(clip_by_global_norm(c), adam(lr))``
(the reference's MPOptimizer contract, mp_optimizer.py:28-47) but evaluated
as ONE pass over the parameter tree: the clip scale folds into the same
per-leaf kernel that updates the Adam moments, so no scaled-gradient or
update tree is ever materialized.  On the v5e the update phase runs 40
optimizer steps per training iteration; each avoided tree materialization
is ~2x the parameter bytes of HBM traffic.

Numerical parity with the optax chain is pinned by
tests/test_learning.py::test_fused_adam_matches_optax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu: optax.Params
    nu: optax.Params


def fused_clip_adam(
    learning_rate: float,
    clip: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """clip_by_global_norm + Adam in a single tree pass."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=zeros,
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        gsq = sum(
            jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads)
        )
        gnorm = jnp.sqrt(gsq)
        # min(1, clip/gnorm) without a divide-by-zero at gnorm == 0
        scale = clip / jnp.maximum(gnorm, clip)
        count = state.count + 1
        t = count.astype(jnp.float32)
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t

        def leaf(g, mu, nu):
            g = g * scale
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            u = (-learning_rate) * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return u, mu, nu

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [leaf(g, m, n) for g, m, n in zip(flat_g, flat_mu, flat_nu)]
        updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in out])
        mu = jax.tree_util.tree_unflatten(treedef, [o[1] for o in out])
        nu = jax.tree_util.tree_unflatten(treedef, [o[2] for o in out])
        return updates, FusedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------- checkpoint migration
#
# The adam moments map 1:1 between the optax chain's ScaleByAdamState and
# FusedAdamState, so checkpoints saved under either optimizer config load
# under the other (Trainer.load migrates on structure mismatch).


def extract_adam_moments(opt_state):
    """(count, mu, nu) from a FusedAdamState or any optax chain whose tree
    contains exactly one adam-moment state (ScaleByAdamState)."""
    found = []

    def walk(x):
        if hasattr(x, "count") and hasattr(x, "mu") and hasattr(x, "nu"):
            found.append(x)
        elif isinstance(x, (tuple, list)):
            for y in x:
                walk(y)

    walk(opt_state)
    if len(found) != 1:
        raise ValueError(
            f"cannot locate adam moments in opt_state "
            f"({len(found)} candidate states); not an adam-family optimizer"
        )
    s = found[0]
    return s.count, s.mu, s.nu


def inject_adam_moments(template, count, mu, nu):
    """A copy of ``template`` (an opt_state) with its adam moments replaced."""

    def walk(x):
        if hasattr(x, "count") and hasattr(x, "mu") and hasattr(x, "nu"):
            return x._replace(count=count, mu=mu, nu=nu)
        if isinstance(x, tuple) and not hasattr(x, "_fields"):
            return tuple(walk(y) for y in x)
        return x

    out = walk(template)
    # verify the replacement actually landed (e.g. sgd has no moments)
    extract_adam_moments(out)
    return out
