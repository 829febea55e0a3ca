"""On-device batch sampling for scanned training loops.

The reference's dual-buffer config samples batch/2 real + batch/2 generated
per gradient step (core/batch_rl_algorithm.py:131-136); here that sampling
happens inside the compiled scan from the buffers' device states."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from s2p_tpu.data.replay import _gather_windows


def _sample_from(state: Dict[str, jax.Array], key: jax.Array, n: int):
    idx = jax.random.randint(key, (n,), 0, state["n"])
    return _gather_windows(
        state["frames"], state["windows"], state["actions"],
        state["rewards"], state["dones"], idx,
    )


def make_window_sampler(
    buf_state: Dict[str, jax.Array],
    batch_size: int,
    buf_gen_state: Optional[Dict[str, jax.Array]] = None,
):
    """Returns sample(key) → SLAC window batch dict; with a generated-data
    buffer the batch is a 50/50 concat (reference dual-buffer rule)."""

    def sample(key: jax.Array) -> Dict[str, jax.Array]:
        if buf_gen_state is None:
            obs, act, rew, done = _sample_from(buf_state, key, batch_size)
        else:
            k1, k2 = jax.random.split(key)
            half = batch_size // 2
            o1, a1, r1, d1 = _sample_from(buf_state, k1, half)
            o2, a2, r2, d2 = _sample_from(buf_gen_state, k2, batch_size - half)
            cat = lambda x, y: jnp.concatenate([x, y], axis=0)
            obs, act = cat(o1, o2), cat(a1, a2)
            rew, done = cat(r1, r2), cat(d1, d2)
        return dict(observations=obs, actions=act, rewards=rew[:, -1],
                    terminals=done[:, -1])

    return sample


def make_flat_sampler(buf_state: Dict[str, jax.Array], batch_size: int):
    """sample(key) → flat transition batch from a SimpleReplayBuffer
    ``device_state()`` (the state-RL scanned-training path)."""

    def sample(key: jax.Array) -> Dict[str, jax.Array]:
        idx = jax.random.randint(key, (batch_size,), 0, buf_state["n"])
        return {
            k: buf_state[k][idx]
            for k in ("observations", "actions", "rewards", "terminals",
                      "next_observations")
        }

    return sample
