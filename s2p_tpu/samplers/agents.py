"""Host-side policy adapters and the SLAC observation window.

- ``SlacObservation`` (reference: rlkit/torch/slac/trainer.py:12-47): a
  num_sequences-frame / (num_sequences−1)-action sliding window with zeros-
  or same-obs episode reset.
- ``PolicyAgent``: the ``get_action`` adapter samplers use (reference
  Policy.get_action, rlkit/policies/base.py:4-17 + MakeDeterministic,
  sac/policies/base.py:56). Action selection is one jitted call —
  stochastic and deterministic variants share the compiled forward.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SlacObservation:
    def __init__(self, state_shape, action_shape, num_sequences: int,
                 reset_w_same_obs: bool = False):
        self.state_shape = tuple(state_shape)
        self.action_shape = tuple(action_shape)
        self.num_sequences = num_sequences
        self.reset_w_same_obs = reset_w_same_obs

    def reset_episode(self, state: np.ndarray) -> None:
        self._state = deque(maxlen=self.num_sequences)
        self._action = deque(maxlen=self.num_sequences - 1)
        for _ in range(self.num_sequences - 1):
            if self.reset_w_same_obs:
                self._state.append(state.copy().astype(np.uint8))
            else:
                self._state.append(np.zeros(self.state_shape, np.uint8))
            self._action.append(np.zeros(self.action_shape, np.float32))
        self._state.append(state)

    def append(self, state: np.ndarray, action: np.ndarray) -> None:
        self._state.append(state)
        self._action.append(np.asarray(action, np.float32))

    @property
    def state(self) -> np.ndarray:
        return np.array(self._state)  # [num_seq, H, W, C]

    @property
    def action(self) -> np.ndarray:
        return np.array(self._action).reshape(-1)  # [(num_seq-1)*A]


class PolicyAgent:
    """get_action over a flax policy module; deterministic=eval mode."""

    def __init__(self, module: Any, params: Any = None,
                 deterministic: bool = False, seed: int = 0):
        self.module = module
        self.params = params
        self.deterministic = deterministic
        self._key = jax.random.PRNGKey(seed)

    def set_params(self, params: Any) -> None:
        self.params = params

    @partial(jax.jit, static_argnums=(0, 3))
    def _act(self, params, obs, deterministic, key):
        dist = self.module.apply(params, obs[None])
        a = dist.mode if deterministic else dist.sample(key)
        return a[0]

    def get_action(self, obs: np.ndarray) -> Tuple[np.ndarray, dict]:
        self._key, sub = jax.random.split(self._key)
        a = self._act(
            self.params, jnp.asarray(obs, jnp.float32), self.deterministic, sub
        )
        return np.asarray(jax.device_get(a)), {}

    def reset(self) -> None:
        pass


class RandomAgent:
    """Uniform random policy (exploration stub / data collection)."""

    def __init__(self, action_space):
        self.action_space = action_space

    def get_action(self, obs) -> Tuple[np.ndarray, dict]:
        return self.action_space.sample(), {}

    def reset(self) -> None:
        pass
