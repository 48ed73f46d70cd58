"""Actor-critic policy: the TPU replacement for SB3's torch MlpPolicy.

Architecture matches the reference's policy exactly (SB3 "MlpPolicy"
defaults used by train.py:122-128 / C14 in SURVEY.md): separate actor and
critic MLPs with two tanh hidden layers of 64 units, a state-independent
log-std parameter initialized to 0, orthogonal initialization with gains
sqrt(2) (hidden), 0.01 (action mean) and 1.0 (value head).

Everything is a flax module over batched (B, obs) arrays — the rollout
evaluates it for thousands of envs per step in one (B,48)x(48,64) matmul
chain, which XLA fuses with the simulation step.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LOG2PI = float(np.log(2.0 * np.pi))


class MLP(nn.Module):
    sizes: Sequence[int]
    out_gain: float

    @nn.compact
    def __call__(self, x):
        for h in self.sizes[:-1]:
            x = nn.tanh(
                nn.Dense(
                    h,
                    kernel_init=nn.initializers.orthogonal(np.sqrt(2.0)),
                    bias_init=nn.initializers.zeros,
                )(x)
            )
        return nn.Dense(
            self.sizes[-1],
            kernel_init=nn.initializers.orthogonal(self.out_gain),
            bias_init=nn.initializers.zeros,
        )(x)


class ActorCritic(nn.Module):
    act_dim: int = 12
    hidden: Sequence[int] = (64, 64)
    log_std_init: float = 0.0

    @nn.compact
    def __call__(self, obs):
        mean = MLP((*self.hidden, self.act_dim), out_gain=0.01, name="actor")(obs)
        value = MLP((*self.hidden, 1), out_gain=1.0, name="critic")(obs)[..., 0]
        log_std = self.param(
            "log_std",
            lambda key, shape: jnp.full(shape, self.log_std_init),
            (self.act_dim,),
        )
        return mean, log_std, value


@dataclasses.dataclass(eq=False)
class Policy:
    """Convenience wrapper: init / act / evaluate as pure functions."""

    module: ActorCritic

    @staticmethod
    def make(act_dim: int = 12, hidden=(64, 64)) -> "Policy":
        return Policy(module=ActorCritic(act_dim=act_dim, hidden=tuple(hidden)))

    def init(self, rng, obs_dim: int = 48):
        return self.module.init(rng, jnp.zeros((1, obs_dim)))

    def apply(self, variables, obs):
        return self.module.apply(variables, obs)

    def sample(self, variables, obs, rng):
        """Returns (action, log_prob, value, mean).  Unbounded Gaussian,
        as SB3: clipping to the action space happens at env boundary."""
        mean, log_std, value = self.apply(variables, obs)
        std = jnp.exp(log_std)
        noise = jax.random.normal(rng, mean.shape, mean.dtype)
        action = mean + std * noise
        logp = self.log_prob(mean, log_std, action)
        return action, logp, value, mean

    @staticmethod
    def log_prob(mean, log_std, action):
        z = (action - mean) * jnp.exp(-log_std)
        return jnp.sum(
            -0.5 * (z * z + LOG2PI) - log_std, axis=-1
        )

    @staticmethod
    def entropy(log_std):
        return jnp.sum(log_std + 0.5 * (LOG2PI + 1.0), axis=-1)

    def act_deterministic(self, variables, obs):
        mean, _, value = self.apply(variables, obs)
        return mean, value
