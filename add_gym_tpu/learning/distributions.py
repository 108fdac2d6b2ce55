"""Diagonal Gaussian action distribution (pure functions).

Ports ``add_gym/learning/distribution_gaussian_diag.py``: StdType FIXED is
the reference config (configs/train.yaml model.actor_std_type, std=0.05);
log-prob/entropy formulas match :90-117.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def sample(key, mean, logstd):
    return mean + jnp.exp(logstd) * jax.random.normal(key, mean.shape)


def log_prob(mean, logstd, x):
    diff = (x - mean) * jnp.exp(-logstd)
    logp = -0.5 * jnp.sum(jnp.square(diff), axis=-1)
    logp += -0.5 * mean.shape[-1] * _LOG_2PI - jnp.sum(
        jnp.broadcast_to(logstd, mean.shape), axis=-1
    )
    return logp


def entropy(mean, logstd):
    dim = mean.shape[-1]
    return jnp.sum(jnp.broadcast_to(logstd, mean.shape), axis=-1) + 0.5 * dim * (
        _LOG_2PI + 1.0
    )


def param_reg(mean):
    return jnp.sum(jnp.square(mean), axis=-1)
