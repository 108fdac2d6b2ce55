"""Action distributions (pure functions).

Ports ``add_gym/learning/distribution_gaussian_diag.py``: StdType FIXED is
the reference config (configs/train.yaml model.actor_std_type, std=0.05);
log-prob/entropy formulas match :90-117.  The categorical head
(``distribution_categorical.py``, unused by the G1 task but part of the
reference model factory, base_model.py:13-31) is provided for discrete
action spaces.
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


# ------------------------------------------------------- categorical head


def categorical_sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def categorical_mode(logits):
    return jnp.argmax(logits, axis=-1)


def categorical_log_prob(logits, x):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(logp, x[..., None].astype(jnp.int32), -1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def categorical_param_reg(logits):
    return jnp.sum(jnp.square(logits), axis=-1)
