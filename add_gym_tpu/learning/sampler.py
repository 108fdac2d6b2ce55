"""Adaptive per-segment curriculum sampler (pure functional).

Port of ``add_gym/learning/sampler.py``: each (clip, segment) keeps an EMA
of tracking error; reset start times are sampled from a softmax over
segment errors (harder segments sampled more).  State is a single array so
it rides inside the jitted train step and can be psum-merged across hosts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SamplerState:
    errors: jnp.ndarray  # [num_clips, num_segments] EMA of tracking error


def init_sampler(num_clips: int, num_segments: int) -> SamplerState:
    return SamplerState(errors=jnp.ones((num_clips, num_segments)))


def update_errors(
    state: SamplerState, seg_sizes, clip_ids, timesteps, tracking_errors,
) -> SamplerState:
    """EMA-update segment errors from rollout data.  Ref: sampler.py:21-55."""
    num_clips, num_segments = state.errors.shape
    sizes = jnp.maximum(seg_sizes[clip_ids], 1e-6)
    seg_idx = jnp.clip((timesteps / sizes).astype(jnp.int32), 0, num_segments - 1)
    flat = clip_ids * num_segments + seg_idx

    total = jnp.zeros(num_clips * num_segments, state.errors.dtype).at[flat].add(
        tracking_errors
    )
    count = jnp.zeros(num_clips * num_segments, state.errors.dtype).at[flat].add(1.0)
    mean = (total / jnp.maximum(count, 1.0)).reshape(state.errors.shape)
    mask = (count > 0).reshape(state.errors.shape)
    new_err = jnp.where(mask, 0.9 * state.errors + 0.1 * mean, state.errors)
    return SamplerState(errors=new_err)


def segment_probs(state: SamplerState, clip_ids, temperature=None):
    """Softmax over segment errors.  Ref: sampler.py:57-73 (default
    temperature = max error over the selected clips)."""
    clip_errors = state.errors[clip_ids]
    if temperature is None:
        temperature = jnp.max(clip_errors) + 1e-6
    return jax.nn.softmax(clip_errors / temperature, axis=-1)


def sample_start_time(
    key, state: SamplerState, clip_ids, seg_sizes, dt: float,
    min_start_time: float, temperature=None,
):
    """Difficulty-weighted start time, dt-quantized.  Ref: sampler.py:75-92."""
    k1, k2 = jax.random.split(key)
    probs = segment_probs(state, clip_ids, temperature)
    segments = jax.random.categorical(k1, jnp.log(jnp.maximum(probs, 1e-30)))
    sizes = seg_sizes[clip_ids]
    t = segments * sizes + jax.random.uniform(k2, clip_ids.shape) * sizes
    t = jnp.floor(t / dt) * dt
    return jnp.maximum(t, min_start_time)
