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


class CNN3Conv1FC(nn.Module):
    """Atari-style conv trunk (reference nets/cnn_3conv_1fc_0.py, unused by
    the G1 task but part of the net registry).  Input [..., H, W, C]."""

    fc_size: int = 512

    @nn.compact
    def __call__(self, x):
        for feat, kern, stride in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
            x = nn.relu(
                nn.Conv(feat, (kern, kern), strides=(stride, stride),
                        padding="VALID")(x)
            )
        x = x.reshape(x.shape[: -3] + (-1,))
        return nn.relu(nn.Dense(self.fc_size, kernel_init=_torch_linear_init)(x))


def build_trunk(name: str) -> nn.Module:
    """Net-registry factory (reference net_builder.py:5-11)."""
    if name in NET_REGISTRY:
        return MLP(NET_REGISTRY[name])
    if name == "cnn_3conv_1fc_0":
        return CNN3Conv1FC()
    raise KeyError(f"unknown net: {name}")


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
    # StdType (distribution_gaussian_diag.py:6-9): "fixed" (config default,
    # logstd supplied by the agent), "constant" (learnable per-dim
    # parameter), "variable" (net output head)
    std_type: str = "fixed"
    init_logstd: float = float(np.log(0.05))

    def setup(self):
        self.actor_trunk = build_trunk(self.actor_net)
        self.actor_mean = nn.Dense(
            self.action_dim,
            kernel_init=_sym_uniform(self.actor_init_output_scale),
            bias_init=nn.initializers.zeros,
        )
        if self.std_type == "constant":
            self.actor_logstd = self.param(
                "actor_logstd",
                lambda key, shape: jnp.full(shape, self.init_logstd),
                (self.action_dim,),
            )
        elif self.std_type == "variable":
            self.actor_logstd_head = nn.Dense(
                self.action_dim,
                kernel_init=_sym_uniform(self.actor_init_output_scale),
                bias_init=nn.initializers.constant(self.init_logstd),
            )
        self.critic_trunk = build_trunk(self.critic_net)
        self.critic_out = nn.Dense(
            1, kernel_init=_torch_linear_init, bias_init=nn.initializers.zeros
        )
        if self.enable_disc:
            self.disc_trunk = build_trunk(self.disc_net)
            self.disc_logit = nn.Dense(
                1,
                kernel_init=_sym_uniform(1.0),
                bias_init=nn.initializers.zeros,
            )

    def actor(self, obs):
        """Returns (mean, logstd); logstd is None for std_type='fixed'."""
        h = self.actor_trunk(obs)
        mean = self.actor_mean(h)
        if self.std_type == "constant":
            logstd = jnp.broadcast_to(self.actor_logstd, mean.shape)
        elif self.std_type == "variable":
            logstd = self.actor_logstd_head(h)
        else:
            logstd = None
        return mean, logstd

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
