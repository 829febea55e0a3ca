"""Minimal distribution toolkit (no external dependency).

Mirrors the reference's distribution layer
(rlkit/torch/distributions.py: MultivariateDiagonalNormal :152, TanhNormal
:313-360, Delta :95) as jit-friendly pytree dataclasses. In JAX every sample
is reparameterized by construction (``sample`` threads an explicit key and
gradients flow), so the reference's rsample/sample split collapses.

TanhNormal uses the numerically stable tanh log-det-Jacobian
``log(1 - tanh(u)^2) = 2(log 2 - u - softplus(-2u))`` instead of the
reference's ``log(1 - a^2 + eps)`` (distributions.py:349-358), which is both
tighter and cheaper on the VPU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

LOG_2 = 0.6931471805599453


@flax.struct.dataclass
class Normal:
    """Diagonal Gaussian over the last axis."""

    loc: jax.Array
    scale: jax.Array

    def sample(self, key: jax.Array, sample_shape: Tuple[int, ...] = ()) -> jax.Array:
        shape = sample_shape + jnp.broadcast_shapes(self.loc.shape, self.scale.shape)
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value: jax.Array) -> jax.Array:
        """Elementwise log-density (sum over event dims at the call site,
        matching torch.distributions.Normal semantics)."""
        var = jnp.square(self.scale)
        return (
            -0.5 * jnp.square(value - self.loc) / var
            - jnp.log(self.scale)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )

    def entropy(self) -> jax.Array:
        return 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(self.scale)

    @property
    def mode(self) -> jax.Array:
        return self.loc

    @property
    def mean(self) -> jax.Array:
        return self.loc

    @property
    def stddev(self) -> jax.Array:
        return jnp.broadcast_to(self.scale, jnp.broadcast_shapes(self.loc.shape, self.scale.shape))

    def kl_divergence(self, other: "Normal") -> jax.Array:
        """KL(self || other), elementwise."""
        var_ratio = jnp.square(self.scale / other.scale)
        t1 = jnp.square((self.loc - other.loc) / other.scale)
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def stable_tanh_log_det_jacobian(pre_tanh: jax.Array) -> jax.Array:
    """log|d tanh(u)/du| = log(1 - tanh(u)^2), computed stably."""
    return 2.0 * (LOG_2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))


@flax.struct.dataclass
class TanhNormal:
    """tanh(Normal(loc, scale)) — the SAC/IQL/CQL policy head
    (reference: rlkit/torch/distributions.py:313-360)."""

    loc: jax.Array
    scale: jax.Array

    @property
    def base(self) -> Normal:
        return Normal(self.loc, self.scale)

    def sample(self, key: jax.Array) -> jax.Array:
        return jnp.tanh(self.base.sample(key))

    def sample_with_pre_tanh(self, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        u = self.base.sample(key)
        return jnp.tanh(u), u

    def sample_and_log_prob(self, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Returns (action, log pi(action)) with log-prob summed over the
        event (last) axis — the shape every trainer consumes."""
        a, u = self.sample_with_pre_tanh(key)
        return a, self.log_prob(a, pre_tanh_value=u)

    def log_prob(
        self, value: jax.Array, pre_tanh_value: Optional[jax.Array] = None
    ) -> jax.Array:
        if pre_tanh_value is None:
            # clip to the open interval before atanh for numeric safety
            clipped = jnp.clip(value, -1.0 + 1e-6, 1.0 - 1e-6)
            pre_tanh_value = jnp.arctanh(clipped)
        elementwise = self.base.log_prob(pre_tanh_value) - stable_tanh_log_det_jacobian(
            pre_tanh_value
        )
        return jnp.sum(elementwise, axis=-1)

    @property
    def mode(self) -> jax.Array:
        return jnp.tanh(self.loc)

    @property
    def mean(self) -> jax.Array:  # convention: deterministic eval action
        return jnp.tanh(self.loc)


@flax.struct.dataclass
class Delta:
    """Deterministic distribution (reference: distributions.py:95)."""

    value: jax.Array

    def sample(self, key: jax.Array) -> jax.Array:
        del key
        return self.value

    def log_prob(self, value: jax.Array) -> jax.Array:
        return jnp.where(
            jnp.all(value == self.value, axis=-1), 0.0, -jnp.inf
        )

    @property
    def mode(self) -> jax.Array:
        return self.value

    @property
    def mean(self) -> jax.Array:
        return self.value
