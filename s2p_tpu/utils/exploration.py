"""Exploration strategies.

Capability contract (reference: rlkit/exploration_strategies/*.py): OU
process, additive Gaussian (optionally decayed), ε-greedy, Gaussian+ε, and
the policy wrapper that applies a strategy to ``get_action``. Host-side
numpy (they wrap env-stepping policies, not jitted code)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class RawExplorationStrategy:
    def get_action_from_raw_action(self, action, **kwargs):
        raise NotImplementedError

    def get_action(self, t, observation, policy, **kwargs):
        action, agent_info = policy.get_action(observation)
        return self.get_action_from_raw_action(action, t=t), agent_info

    def reset(self):
        pass


class EpsilonGreedy(RawExplorationStrategy):
    """With probability ε take a uniform random action
    (reference epsilon_greedy.py:6)."""

    def __init__(self, action_space, prob_random_action: float = 0.1, seed: int = 0):
        self.action_space = action_space
        self.prob_random_action = prob_random_action
        self._rng = np.random.RandomState(seed)

    def get_action_from_raw_action(self, action, **kwargs):
        if self._rng.random_sample() <= self.prob_random_action:
            return self.action_space.sample()
        return action


class GaussianStrategy(RawExplorationStrategy):
    """Additive Gaussian noise linearly annealed from max_sigma to min_sigma
    (reference gaussian_strategy.py:5)."""

    def __init__(self, action_space, max_sigma: float = 1.0,
                 min_sigma: Optional[float] = None,
                 decay_period: int = 1_000_000, seed: int = 0):
        self._action_space = action_space
        self._max_sigma = max_sigma
        self._min_sigma = max_sigma if min_sigma is None else min_sigma
        self._decay_period = decay_period
        self._rng = np.random.RandomState(seed)

    def get_action_from_raw_action(self, action, t: int = 0, **kwargs):
        sigma = self._max_sigma - (self._max_sigma - self._min_sigma) * min(
            1.0, t * 1.0 / self._decay_period
        )
        return np.clip(
            action + self._rng.normal(size=len(action)) * sigma,
            self._action_space.low, self._action_space.high,
        )


class GaussianAndEpsilonStrategy(RawExplorationStrategy):
    """ε-greedy + Gaussian otherwise (reference
    gaussian_and_epsilon_strategy.py:6)."""

    def __init__(self, action_space, epsilon: float = 0.1, max_sigma: float = 1.0,
                 min_sigma: Optional[float] = None, decay_period: int = 1_000_000,
                 seed: int = 0):
        self._epsilon = epsilon
        self._action_space = action_space
        self._gaussian = GaussianStrategy(
            action_space, max_sigma, min_sigma, decay_period, seed=seed
        )
        self._rng = np.random.RandomState(seed + 1)

    def get_action_from_raw_action(self, action, t: int = 0, **kwargs):
        if self._rng.random_sample() < self._epsilon:
            return self._action_space.sample()
        return self._gaussian.get_action_from_raw_action(action, t=t)


class OUStrategy(RawExplorationStrategy):
    """Ornstein-Uhlenbeck temporally-correlated noise
    (reference ou_strategy.py:7)."""

    def __init__(self, action_space, mu: float = 0.0, theta: float = 0.15,
                 max_sigma: float = 0.3, min_sigma: Optional[float] = None,
                 decay_period: int = 100_000, seed: int = 0):
        self.mu = mu
        self.theta = theta
        self.sigma = max_sigma
        self._max_sigma = max_sigma
        self._min_sigma = max_sigma if min_sigma is None else min_sigma
        self._decay_period = decay_period
        self.dim = np.prod(action_space.low.shape)
        self.low = action_space.low
        self.high = action_space.high
        self._rng = np.random.RandomState(seed)
        self.reset()

    def reset(self):
        self.state = np.ones(self.dim) * self.mu

    def evolve_state(self):
        dx = self.theta * (self.mu - self.state) + self.sigma * self._rng.randn(
            len(self.state)
        )
        self.state = self.state + dx
        return self.state

    def get_action_from_raw_action(self, action, t: int = 0, **kwargs):
        ou_state = self.evolve_state()
        self.sigma = self._max_sigma - (self._max_sigma - self._min_sigma) * min(
            1.0, t * 1.0 / self._decay_period
        )
        return np.clip(action + ou_state, self.low, self.high)


class PolicyWrappedWithExplorationStrategy:
    """get_action adapter (reference base.py:28)."""

    def __init__(self, exploration_strategy: RawExplorationStrategy, policy):
        self.es = exploration_strategy
        self.policy = policy
        self.t = 0

    def get_action(self, *args, **kwargs) -> Tuple[np.ndarray, dict]:
        action, info = self.es.get_action(self.t, *args, policy=self.policy, **kwargs)
        self.t += 1
        return action, info

    def reset(self):
        self.es.reset()
        self.policy.reset()
        self.t = 0
