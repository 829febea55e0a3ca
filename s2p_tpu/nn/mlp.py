"""MLP building blocks.

Behavioral contract mirrors the reference's rlkit MLPs
(rlkit/torch/networks/mlp.py:14-127): fan-in uniform hidden init, constant
bias fill, U(-init_w, init_w) final layer, optional LayerNorm on all hidden
layers but the last, configurable hidden/output activations, and a ConcatMlp
(mlp.py:129) that flattens multiple inputs along the last axis (the Q/V
critic entry point).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from s2p_tpu.nn.initializers import fanin_uniform


def _uniform(init_w: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -init_w, init_w)

    return init


def _constant(value: float):
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, value, dtype)

    return init


class Mlp(nn.Module):
    hidden_sizes: Sequence[int]
    output_size: int
    init_w: float = 3e-3
    hidden_activation: Callable = nn.relu
    output_activation: Optional[Callable] = None
    b_init_value: float = 0.0
    layer_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_preactivations: bool = False):
        h = x.astype(self.dtype)
        n = len(self.hidden_sizes)
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(
                size,
                kernel_init=fanin_uniform(),
                bias_init=_constant(self.b_init_value),
                dtype=self.dtype,
                name=f"fc{i}",
            )(h)
            # reference quirk kept: layer-norm on all hidden layers except the
            # last hidden layer (mlp.py:63-64 checks i < len(fcs) - 1)
            if self.layer_norm and i < n - 1:
                h = nn.LayerNorm(dtype=self.dtype, name=f"layer_norm{i}")(h)
            h = self.hidden_activation(h)
        pre = nn.Dense(
            self.output_size,
            kernel_init=_uniform(self.init_w),
            bias_init=_constant(0.0),
            dtype=self.dtype,
            name="last_fc",
        )(h)
        out = self.output_activation(pre) if self.output_activation else pre
        if return_preactivations:
            return out, pre
        return out


class ConcatMlp(Mlp):
    """Mlp over ``concat(*inputs, axis=-1)`` — Q(s,a)/V entry point
    (reference: rlkit/torch/networks/mlp.py:129-142)."""

    @nn.compact
    def __call__(self, *inputs: jax.Array, **kwargs):
        x = jnp.concatenate(inputs, axis=-1)
        return super().__call__(x, **kwargs)


class MultiHeadedMlp(nn.Module):
    """Shared trunk with N linear heads (reference: mlp.py:76-127)."""

    hidden_sizes: Sequence[int]
    output_sizes: Sequence[int]
    init_w: float = 3e-3
    hidden_activation: Callable = nn.relu
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        h = x
        n = len(self.hidden_sizes)
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(size, kernel_init=fanin_uniform(), name=f"fc{i}")(h)
            if self.layer_norm and i < n - 1:
                h = nn.LayerNorm(name=f"layer_norm{i}")(h)
            h = self.hidden_activation(h)
        return tuple(
            nn.Dense(out, kernel_init=_uniform(self.init_w), name=f"head{j}")(h)
            for j, out in enumerate(self.output_sizes)
        )
