"""Network definitions (flax) for the PPO/ADD models.

Mirrors the reference net registry (``add_gym/learning/nets/``): named MLP
architectures with ReLU activations and zero bias init; the actor mean head
uses uniform(+-actor_init_output_scale) init (distribution_gaussian_diag.py:
19-23), the disc logit head uniform(+-1) (add_model.py:32-46).  Dense kernels
use torch-Linear-style U(+-1/sqrt(fan_in)) so learning dynamics match the
reference closely.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

# name -> hidden layer sizes, matching the reference registry exactly
# (e.g. nets/fc_3layers_1024units.py: [1024, 1024, 512])
NET_REGISTRY = {
    "fc_2layers_64units": (64, 64),
    "fc_2layers_128units": (128, 128),
    "fc_2layers_256units": (256, 256),
    "fc_2layers_512units": (512, 512),
    "fc_2layers_1024units": (1024, 512),
    "fc_3layers_1024units": (1024, 1024, 512),
}

_torch_linear_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def _sym_uniform(scale: float):
    """U(-scale, scale) init (flax's ``uniform`` is one-sided [0, scale))."""

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class MLP(nn.Module):
    sizes: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for s in self.sizes:
            x = nn.relu(
                nn.Dense(s, kernel_init=_torch_linear_init,
                         bias_init=nn.initializers.zeros)(x)
            )
        return x


class ADDNet(nn.Module):
    """Actor + critic [+ discriminator], mirroring the reference model
    hierarchy (PPOModel -> ADDModel, ppo_model.py / add_model.py).  With
    ``enable_disc=False`` this is a plain PPO model (no disc parameters)."""

    action_dim: int
    actor_net: str = "fc_3layers_1024units"
    critic_net: str = "fc_3layers_1024units"
    disc_net: str = "fc_2layers_1024units"
    actor_init_output_scale: float = 0.01
    enable_disc: bool = True

    def setup(self):
        self.actor_trunk = MLP(NET_REGISTRY[self.actor_net])
        self.actor_mean = nn.Dense(
            self.action_dim,
            kernel_init=_sym_uniform(self.actor_init_output_scale),
            bias_init=nn.initializers.zeros,
        )
        self.critic_trunk = MLP(NET_REGISTRY[self.critic_net])
        self.critic_out = nn.Dense(
            1, kernel_init=_torch_linear_init, bias_init=nn.initializers.zeros
        )
        if self.enable_disc:
            self.disc_trunk = MLP(NET_REGISTRY[self.disc_net])
            self.disc_logit = nn.Dense(
                1,
                kernel_init=_sym_uniform(1.0),
                bias_init=nn.initializers.zeros,
            )

    def actor(self, obs):
        return self.actor_mean(self.actor_trunk(obs))

    def critic(self, obs):
        return self.critic_out(self.critic_trunk(obs))[..., 0]

    def disc(self, disc_obs):
        return self.disc_logit(self.disc_trunk(disc_obs))[..., 0]

    def __call__(self, obs, disc_obs):
        # used only for init: touch every submodule
        out = (self.actor(obs), self.critic(obs))
        if self.enable_disc:
            out = out + (self.disc(disc_obs),)
        return out
