"""Gaussian mixture distributions.

Capability contract (reference: rlkit/torch/distributions.py:192-311
``GaussianMixture``/``GaussianMixtureFull``): K diagonal Gaussians over the
action dim with per-sample weights; log_prob via logsumexp over components;
``mle_estimate`` = mean of the most likely component. Layouts follow the
reference: means/stds [B, D, K]; weights [B, K] (the reference carries
[B, K, 1] / shared-over-dim weights — collapsed here)."""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from s2p_tpu.nn.distributions import Normal


@flax.struct.dataclass
class GaussianMixture:
    means: jax.Array  # [B, D, K]
    stds: jax.Array  # [B, D, K]
    weights: jax.Array  # [B, K], rows sum to 1

    @property
    def num_gaussians(self) -> int:
        return self.weights.shape[-1]

    def log_prob(self, value: jax.Array) -> jax.Array:
        """[B] mixture log-density (sum over action dims per component,
        logsumexp over components — reference :203-211)."""
        comp = Normal(
            jnp.moveaxis(self.means, -1, 0), jnp.moveaxis(self.stds, -1, 0)
        ).log_prob(value[None])  # [K, B, D]
        log_p = jnp.sum(comp, axis=-1)  # [K, B]
        lp = jnp.log(self.weights.T + 1e-12) + log_p  # [K, B]
        return jax.scipy.special.logsumexp(lp, axis=0)

    def sample(self, key: jax.Array) -> jax.Array:
        k1, k2 = jax.random.split(key)
        z = Normal(self.means, self.stds).sample(k1)  # [B, D, K]
        c = jax.random.categorical(k2, jnp.log(self.weights + 1e-12))  # [B]
        return jnp.take_along_axis(z, c[:, None, None], axis=-1)[..., 0]

    def mle_estimate(self) -> jax.Array:
        """Mean of the most likely component (reference :233-243)."""
        ind = jnp.argmax(self.weights, axis=-1)
        return jnp.take_along_axis(self.means, ind[:, None, None], axis=-1)[..., 0]

    @property
    def mode(self) -> jax.Array:
        return self.mle_estimate()

    @property
    def mean(self) -> jax.Array:
        return jnp.sum(self.means * self.weights[:, None, :], axis=-1)
