"""Seed / RNG discipline.

The reference seeds python/numpy/torch globally once per run
(rlkit/launchers/launcher_util.py:352-361, finetune_rl.py:109-114). JAX RNG is
explicit, so instead of a global we provide:

- ``set_seed``: seeds python/numpy (for host-side shuffling / env seeding)
  and returns the root ``jax.random.key``.
- ``RngStream``: a named, splittable stream so every consumer (params init,
  dropout, sampling, buffer sampling) gets an independent, reproducible
  substream — one root seed reproduces the whole run, matching the reference's
  determinism contract that makes csv-regression testing possible (SURVEY §4).
"""

from __future__ import annotations

import random
from typing import Dict

import jax
import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


class RngStream:
    """Stateful-on-host, pure-on-device RNG dispenser.

    Host code calls ``next("name")`` to get fresh keys; anything passed into a
    jitted function receives keys as explicit arguments, keeping device code
    pure. Each name folds a distinct tag so streams are independent.
    """

    def __init__(self, seed: int) -> None:
        self._root = jax.random.key(seed)
        self._counters: Dict[str, int] = {}

    def next(self, name: str = "default") -> jax.Array:
        i = self._counters.get(name, 0)
        self._counters[name] = i + 1
        tagged = jax.random.fold_in(self._root, _stable_hash(name))
        return jax.random.fold_in(tagged, i)

    def next_n(self, n: int, name: str = "default") -> jax.Array:
        return jax.random.split(self.next(name), n)

    def state(self) -> Dict[str, int]:
        """Counters for checkpoint/resume."""
        return dict(self._counters)

    def restore(self, counters: Dict[str, int]) -> None:
        self._counters = dict(counters)


def _stable_hash(s: str) -> int:
    # Python's hash() is salted per-process; use a stable FNV-1a instead.
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
