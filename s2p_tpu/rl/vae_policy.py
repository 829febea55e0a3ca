"""BEAR/BCQ-style VAE behavior policy + PolicyFromQ.

Capability contracts:
- ``VAEPolicy`` (reference: rlkit/torch/sac/policies/vae_policy.py): CVAE
  over (state, action) — encoder (750, 750) → (μ, logσ clamped [−4, 15]),
  decoder (750, 750) → tanh'd action scaled by max_action; ``decode`` with
  clipped z ∼ N(0, 0.5²) when no latent is given; ``decode_multiple`` for
  the BEAR MMD penalty.
- ``PolicyFromQ`` (reference: rlkit/torch/sac/policies/policy_from_q.py):
  act by sampling N proposals from a base policy and taking the argmax-Q.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class VAEPolicy(nn.Module):
    obs_dim: int
    action_dim: int
    latent_dim: int
    hidden: int = 750
    max_action: float = 1.0

    def setup(self) -> None:
        self.e1 = nn.Dense(self.hidden)
        self.e2 = nn.Dense(self.hidden)
        self.mean = nn.Dense(self.latent_dim)
        self.log_std = nn.Dense(self.latent_dim)
        self.d1 = nn.Dense(self.hidden)
        self.d2 = nn.Dense(self.hidden)
        self.d3 = nn.Dense(self.action_dim)

    def __call__(self, state: jax.Array, action: jax.Array, rng: jax.Array):
        """Returns (reconstruction, mean, std) — the BEAR training triple."""
        h = nn.relu(self.e1(jnp.concatenate([state, action], axis=1)))
        h = nn.relu(self.e2(h))
        mean = self.mean(h)
        log_std = jnp.clip(self.log_std(h), -4.0, 15.0)
        std = jnp.exp(log_std)
        z = mean + std * jax.random.normal(rng, std.shape)
        return self.decode(state, z), mean, std

    def decode(self, state: jax.Array, z: Optional[jax.Array] = None,
               rng: Optional[jax.Array] = None) -> jax.Array:
        if z is None:
            z = jnp.clip(
                0.5 * jax.random.normal(rng, (state.shape[0], self.latent_dim)),
                -0.5, 0.5,
            )
        h = nn.relu(self.d1(jnp.concatenate([state, z], axis=1)))
        h = nn.relu(self.d2(h))
        return self.max_action * jnp.tanh(self.d3(h))

    def decode_multiple(self, state: jax.Array, rng: jax.Array,
                        num_decode: int = 10) -> Tuple[jax.Array, jax.Array]:
        """(tanh'd actions, raw actions) for N samples per state
        (BEAR MMD penalty input)."""
        B = state.shape[0]
        z = jnp.clip(
            0.5 * jax.random.normal(rng, (B, num_decode, self.latent_dim)),
            -0.5, 0.5,
        )
        tiled = jnp.repeat(state[:, None], num_decode, axis=1)
        h = nn.relu(self.d1(jnp.concatenate([tiled, z], axis=-1)))
        h = nn.relu(self.d2(h))
        raw = self.d3(h)
        return self.max_action * jnp.tanh(raw), raw


def elbo_loss(model: VAEPolicy, params, state, action, rng,
              kl_weight: float = 0.5) -> jax.Array:
    """Reconstruction MSE + β·KL(N(μ,σ)‖N(0,I)) (BEAR/BCQ training)."""
    recon, mean, std = model.apply(params, state, action, rng)
    recon_loss = jnp.mean((recon - action) ** 2)
    kl = -0.5 * jnp.mean(1 + 2 * jnp.log(std) - mean**2 - std**2)
    return recon_loss + kl_weight * kl


class PolicyFromQ:
    """Sample N proposals from ``policy``, act with the argmax of
    ``qf(obs, a)`` (reference policy_from_q.py)."""

    def __init__(self, qf_apply, qf_params, policy_module, policy_params,
                 num_samples: int = 10, seed: int = 0):
        self.qf_apply = qf_apply
        self.qf_params = qf_params
        self.policy_module = policy_module
        self.policy_params = policy_params
        self.num_samples = num_samples
        self._key = jax.random.PRNGKey(seed)

    def get_action(self, obs):
        import numpy as np

        self._key, sub = jax.random.split(self._key)
        obs_j = jnp.asarray(obs, jnp.float32)[None]
        tiled = jnp.repeat(obs_j, self.num_samples, axis=0)
        dist = self.policy_module.apply(self.policy_params, tiled)
        actions = dist.sample(sub)
        q = self.qf_apply(self.qf_params, tiled, actions)
        best = jnp.argmax(q.ravel())
        return np.asarray(actions[best]), {}

    def reset(self):
        pass
