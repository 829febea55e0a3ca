"""Autoregressive N-step image generation as a single compiled scan.

Reference behavior (spec): ``simple_test.py --start_idx --seq_len`` takes the
ground-truth image i_{t0} and states s_{t0+1..t0+L}, then generates
i_{t+1} = G(s_{t+1}, î_t) autoregressively for L steps
(/root/reference/README.md:27-34; SURVEY §3.6). On TPU the whole rollout is
one ``jax.lax.scan`` with the previous generated frame threaded as carry —
one XLA program, zero host round-trips per frame.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(0,))
def generate_rollout(
    generator,  # S2PGenerator (static)
    params: Any,
    init_image: jax.Array,  # [B, H, W, C] in [-1, 1]
    states: jax.Array,  # [T, B, S] — s_{t+1} for each step
) -> jax.Array:
    """Returns generated frames [T, B, H, W, C] in [-1, 1]."""

    def step(prev_img, state):
        img = generator.apply(params, state, prev_img)
        return img, img

    _, frames = jax.lax.scan(step, init_image, states)
    return frames
