"""Policy networks.

Capability contract (reference: rlkit/torch/sac/policies/gaussian_policy.py
and rlkit/policies/base.py):

- ``TanhGaussianPolicy`` (gaussian_policy.py:76-172): Mlp trunk, mean head
  + state-dependent log_std head clamped to [−20, 2] (or a fixed std),
  returning a TanhNormal; ``logprob(action | mean, std)`` for BC losses
  (:163-172).
- ``GaussianPolicy`` (:174+): mean-tanh'd Gaussian with configurable std
  architecture (kept to the 'shared' variant used by AWAC-style configs).
- ``MakeDeterministic`` (sac/policies/base.py:56): eval wrapper that takes
  the distribution mode.

flax modules return distribution pytrees (s2p_tpu.nn.distributions); host
adapters that step environments live in s2p_tpu.samplers.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.distributions import Delta, Normal, TanhNormal
from s2p_tpu.nn.initializers import fanin_uniform

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -20.0


def _uniform(init_w: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -init_w, init_w)

    return init


class TanhGaussianPolicy(nn.Module):
    hidden_sizes: Sequence[int]
    action_dim: int
    std: Optional[float] = None
    init_w: float = 1e-3
    hidden_activation: Callable = nn.relu

    @nn.compact
    def __call__(self, obs: jax.Array) -> TanhNormal:
        h = obs
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(size, kernel_init=fanin_uniform(), name=f"fc{i}")(h)
            h = self.hidden_activation(h)
        mean = nn.Dense(
            self.action_dim, kernel_init=_uniform(self.init_w),
            bias_init=_uniform(self.init_w), name="last_fc",
        )(h)
        if self.std is None:
            log_std = nn.Dense(
                self.action_dim, kernel_init=_uniform(self.init_w),
                bias_init=_uniform(self.init_w), name="last_fc_log_std",
            )(h)
            log_std = jnp.clip(log_std, LOG_SIG_MIN, LOG_SIG_MAX)
            std = jnp.exp(log_std)
        else:
            std = jnp.full_like(mean, self.std)
        return TanhNormal(mean, std)


class GaussianPolicy(nn.Module):
    """Untanh'd-sampling Gaussian with tanh'd mean (reference
    gaussian_policy.py:174-261, std_architecture='shared')."""

    hidden_sizes: Sequence[int]
    action_dim: int
    std: Optional[float] = None
    init_w: float = 1e-3
    max_log_std: float = 0.0
    min_log_std: float = -6.0
    hidden_activation: Callable = nn.relu

    @nn.compact
    def __call__(self, obs: jax.Array) -> Normal:
        h = obs
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(size, kernel_init=fanin_uniform(), name=f"fc{i}")(h)
            h = self.hidden_activation(h)
        mean = jnp.tanh(
            nn.Dense(self.action_dim, kernel_init=_uniform(self.init_w),
                     name="last_fc")(h)
        )
        if self.std is None:
            log_std = nn.Dense(
                self.action_dim, kernel_init=_uniform(self.init_w),
                name="last_fc_log_std",
            )(h)
            log_std = jnp.clip(log_std, self.min_log_std, self.max_log_std)
            std = jnp.exp(log_std)
        else:
            std = jnp.full_like(mean, self.std)
        return Normal(mean, std)


def make_deterministic(dist) -> Delta:
    """MakeDeterministic (reference sac/policies/base.py:56)."""
    return Delta(dist.mode)
