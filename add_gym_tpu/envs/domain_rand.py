"""Domain randomization: per-env physics perturbations, resampled at reset.

The reference has no DR (its engines share one compiled model across all
envs), but the parity brief's pod-scale config calls for a domain-randomized
G1 (BASELINE.md configs[5]).  The TPU-native design makes DR cheap: PD
gains and ground friction become per-env *data* (EngineParams leaves), so
randomization is a masked resample inside the jitted reset — no recompiles,
no host round-trips.

Randomized quantities:
- ``kp_scale`` / ``kv_scale`` — PD gain multipliers, log-uniform around 1
  (actuator strength)
- ``friction`` — ground Coulomb friction coefficient, log-uniform
- ``latency`` — first-order actuation delay: the applied PD target is
  ``(1-a)*cmd + a*prev`` with per-env smoothing factor a (uniform in range;
  0 = no delay)
- ``mass_scale`` — whole-body mass/inertia multiplier, log-uniform (the
  standard sim2real axis: same actuators, heavier/lighter robot).  Scales
  spatial inertias, bias forces and contact springs in the fused step
  (fused_step._substep_core ``ms``); requires ``engine.fused`` (the Pallas
  kernel bakes inertia constants and refuses per-env mass).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class DRConfig:
    enabled: bool = False
    kp_scale_range: tuple = (0.8, 1.2)
    kv_scale_range: tuple = (0.8, 1.2)
    friction_range: tuple = (0.6, 1.4)
    action_latency_range: tuple = (0.0, 0.0)
    mass_range: tuple = (1.0, 1.0)

    @property
    def mass_enabled(self) -> bool:
        return tuple(self.mass_range) != (1.0, 1.0)


def init_dr_state(num_envs: int):
    """Identity perturbations."""
    ones = jnp.ones(num_envs)
    return dict(
        kp_scale=ones, kv_scale=ones, friction_mu=ones,
        latency=jnp.zeros(num_envs), mass_scale=ones,
    )


def sample_dr(key, cfg: DRConfig, num_envs: int):
    """Fresh per-env perturbations within the config ranges."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)

    def logu(k, lo, hi):
        return jnp.exp(
            jax.random.uniform(
                k, (num_envs,), minval=jnp.log(lo), maxval=jnp.log(hi)
            )
        )

    return dict(
        kp_scale=logu(k1, *cfg.kp_scale_range),
        kv_scale=logu(k2, *cfg.kv_scale_range),
        friction_mu=logu(k3, *cfg.friction_range),
        latency=jax.random.uniform(
            k4, (num_envs,),
            minval=cfg.action_latency_range[0],
            maxval=cfg.action_latency_range[1],
        ),
        mass_scale=logu(k5, *cfg.mass_range),
    )
