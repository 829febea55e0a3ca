"""Weight initializers matching the reference's conventions.

- ``fanin_uniform``: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the rlkit MLP
  default (reference: rlkit/torch/networks/mlp.py:23,45 via
  pytorch_util.fanin_init).
- ``scaled_orthogonal``: orthogonal with gain — SLAC's initializer
  (reference: rlkit/torch/slac/network/initializer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import orthogonal


def fanin_uniform():
    def init(key, shape, dtype=jnp.float32):
        # flax kernels are (in, out); convs are (*window, in, out)
        fan_in = 1
        for d in shape[:-1]:
            fan_in *= d
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_orthogonal(gain: float = 1.41421356):  # sqrt(2), SLAC default
    return orthogonal(scale=gain)


def uniform_bias(bound: float = 0.1):
    """rlkit's b_init_value=0.1-style constant-range bias init
    (reference: rlkit/torch/networks/mlp.py:30,47 uses constant fill;
    we default to the same constant)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, bound, dtype)

    return init
