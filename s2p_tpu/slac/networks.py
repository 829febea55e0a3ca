"""SLAC actor-critic networks.

Capability contract (reference: rlkit/torch/slac/network/sac.py:8-64):
- ``SlacGaussianPolicy``: single MLP over the feature_action window →
  (mean, log_std clamped [−20, 2]); ``forward`` = tanh(mean) (deterministic
  act), ``sample`` = tanh-reparameterized action + corrected log π
  (slac/utils.py:51-63).
- ``TwinnedQNetwork``: two MLPs over [z ‖ a].

Xavier-uniform init (network/initializer.py). These power the online
SLAC+SAC path; the offline S2P configs use s2p_tpu.rl's policies/critics."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.distributions import TanhNormal

xavier = nn.initializers.xavier_uniform()


class SlacGaussianPolicy(nn.Module):
    action_dim: int
    hidden_units: Sequence[int] = (256, 256)

    @nn.compact
    def _net(self, feature_action: jax.Array) -> Tuple[jax.Array, jax.Array]:
        h = feature_action
        for i, u in enumerate(self.hidden_units):
            h = nn.relu(nn.Dense(u, kernel_init=xavier, name=f"fc{i}")(h))
        out = nn.Dense(2 * self.action_dim, kernel_init=xavier,
                       name=f"fc{len(self.hidden_units)}")(h)
        mean, log_std = jnp.split(out, 2, axis=-1)
        return mean, jnp.clip(log_std, -20.0, 2.0)

    def __call__(self, feature_action: jax.Array) -> jax.Array:
        """Deterministic action = tanh(mean) (reference sac.py:24-27)."""
        mean, _ = self._net(feature_action)
        return jnp.tanh(mean)

    def sample(self, feature_action: jax.Array, rng: jax.Array):
        """(action, log π) with the tanh correction (reference sac.py:29-33,
        slac/utils.py:51-63)."""
        mean, log_std = self._net(feature_action)
        dist = TanhNormal(mean, jnp.exp(log_std))
        action, log_pi = dist.sample_and_log_prob(rng)
        return action, log_pi[:, None]

    def dist(self, feature_action: jax.Array) -> TanhNormal:
        mean, log_std = self._net(feature_action)
        return TanhNormal(mean, jnp.exp(log_std))


class TwinnedQNetwork(nn.Module):
    hidden_units: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, z: jax.Array, action: jax.Array):
        x = jnp.concatenate([action, z], axis=-1)

        def tower(name: str) -> jax.Array:
            h = x
            for i, u in enumerate(self.hidden_units):
                h = nn.relu(
                    nn.Dense(u, kernel_init=xavier, name=f"{name}_fc{i}")(h)
                )
            return nn.Dense(1, kernel_init=xavier, name=f"{name}_out")(h)

        return tower("net1"), tower("net2")
