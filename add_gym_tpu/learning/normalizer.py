"""Running input normalizers as pure pytree state.

Ports the reference semantics:
- ``Normalizer`` (normalizer.py): running mean/std from count/sum/sum-sq
  batches, merged by weighted average; distributed sync is a psum over the
  data axis (normalizer.py:41-58) — here the stats reduction happens
  naturally under GSPMD when the batch is sharded.
- ``DiffNormalizer`` (diff_normalizer.py): mean-absolute-value scaling for
  ADD observation differences.

Stats live in the train state (checkpointed like the reference's
non-grad Parameters, normalizer.py:128-156).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class NormState:
    count: jnp.ndarray    # [] float
    mean: jnp.ndarray     # [shape]
    mean_sq: jnp.ndarray  # [shape]
    min_std: float = field(metadata=dict(static=True), default=1e-4)
    clip: float = field(metadata=dict(static=True), default=jnp.inf)

    @property
    def std(self):
        var = jnp.maximum(self.mean_sq - jnp.square(self.mean), self.min_std**2)
        return jnp.sqrt(var)


def init_normalizer(shape, init_mean=None, init_std=None, min_std=1e-4, clip=float("inf")):
    mean = jnp.zeros(shape) if init_mean is None else jnp.asarray(init_mean, jnp.float32)
    std = jnp.ones(shape) if init_std is None else jnp.asarray(init_std, jnp.float32)
    return NormState(
        count=jnp.zeros(()),
        mean=mean,
        mean_sq=jnp.square(std) + jnp.square(mean),
        min_std=min_std,
        clip=clip,
    )


def normalize(state: NormState, x):
    y = (x - state.mean) / state.std
    return jnp.clip(y, -state.clip, state.clip)


def unnormalize(state: NormState, y):
    return y * state.std + state.mean


def update_normalizer(state: NormState, batch) -> NormState:
    """Merge a batch [..., shape] of samples.  Ref: normalizer.py:25-79.

    Under a sharded batch this mean is a global mean (XLA inserts the
    cross-device reduction), matching the reference's all_reduce.
    """
    n_new = jnp.asarray(
        jnp.prod(jnp.asarray(batch.shape[: batch.ndim - state.mean.ndim])),
        jnp.float32,
    )
    flat = batch.reshape((-1,) + state.mean.shape)
    new_mean = jnp.mean(flat, axis=0)
    new_mean_sq = jnp.mean(jnp.square(flat), axis=0)

    total = state.count + n_new
    w_old = state.count / total
    w_new = n_new / total
    return NormState(
        count=total,
        mean=w_old * state.mean + w_new * new_mean,
        mean_sq=w_old * state.mean_sq + w_new * new_mean_sq,
        min_std=state.min_std,
        clip=state.clip,
    )


def update_normalizer_from_stats(state: NormState, n_new, s, s_sq) -> NormState:
    """Merge pre-accumulated batch statistics (count, sum, sum-of-squares).

    Same merge as :func:`update_normalizer` given
    ``n_new = count``, ``s = sum(batch, axis=0)``,
    ``s_sq = sum(batch**2, axis=0)`` — used by the lean rollout, which
    accumulates the acting-obs stats inside the scan instead of
    materializing the raw observation trajectory (the reference records
    obs into a buffer and sums once, normalizer.py:25-43; summation order
    differs only by f32 reassociation).
    """
    n_new = jnp.asarray(n_new, jnp.float32)
    total = state.count + n_new
    w_old = state.count / total
    return NormState(
        count=total,
        mean=w_old * state.mean + s / total,
        mean_sq=w_old * state.mean_sq + s_sq / total,
        min_std=state.min_std,
        clip=state.clip,
    )


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DiffNormState:
    count: jnp.ndarray     # []
    mean_abs: jnp.ndarray  # [shape]
    min_diff: float = field(metadata=dict(static=True), default=1e-4)
    clip: float = field(metadata=dict(static=True), default=jnp.inf)


def init_diff_normalizer(shape, min_diff=1e-4, clip=float("inf")):
    return DiffNormState(
        count=jnp.zeros(()), mean_abs=jnp.ones(shape), min_diff=min_diff, clip=clip
    )


def diff_normalize(state: DiffNormState, x):
    d = jnp.maximum(state.mean_abs, state.min_diff)
    return jnp.clip(x / d, -state.clip, state.clip)


def update_diff_normalizer(state: DiffNormState, batch) -> DiffNormState:
    """Ref: diff_normalizer.py:25-45."""
    n_new = jnp.asarray(
        jnp.prod(jnp.asarray(batch.shape[: batch.ndim - state.mean_abs.ndim])),
        jnp.float32,
    )
    flat = batch.reshape((-1,) + state.mean_abs.shape)
    new_mean_abs = jnp.mean(jnp.abs(flat), axis=0)
    total = state.count + n_new
    return DiffNormState(
        count=total,
        mean_abs=(state.count / total) * state.mean_abs
        + (n_new / total) * new_mean_abs,
        min_diff=state.min_diff,
        clip=state.clip,
    )
