"""y = m*x + b reward/terminal transform
(reference: rlkit/torch/networks/linear_transform.py:4; applied to
rewards/terminals at the top of every IQL/CQL step,
iql_trainer.py:218-222)."""

from __future__ import annotations

import dataclasses

import jax


@dataclasses.dataclass(frozen=True)
class LinearTransform:
    m: float = 1.0
    b: float = 0.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.m * x + self.b
