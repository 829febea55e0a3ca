"""Device-resident replay buffers.

TPU-first redesign of the reference's replay layer:

- The SLAC sequence buffer (reference: rlkit/torch/slac/buffer.py:71-197)
  stores each slot as a 9-frame ``LazyFrames`` list on CPU and gathers
  per-sample with a Python loop + host→GPU copy every ``random_batch``
  (buffer.py:153-167) — the per-step host↔device hop the TPU build must
  kill (SURVEY §7). Here, unique frames live **once** in a uint8
  ``[F, H, W, C]`` pool and each slot is 9 int32 indices; sampling is a
  single on-device gather inside jit, and the whole buffer state is a pytree
  (``device_state()``) that can be folded into a scanned train step.
- The LazyFrames dedup trick becomes unnecessary by construction: windows
  overlap in the index array, not in pixels.
- Ingestion replicates the reference's episode/timeout/sentinel semantics
  exactly (rlkit/torch/slac/algo.py:154-416) but vectorized — no Python
  loop over 100k rows.

``SimpleReplayBuffer`` mirrors the state-RL buffer incl. the
memory-efficient 3-frame-stack reconstruction
(rlkit/data_management/simple_replay_buffer.py:26-46,115-118).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s2p_tpu.data.hdf5 import SENTINEL, episode_slices


@functools.partial(jax.jit, donate_argnums=())
def _gather_windows(
    frames: jax.Array,
    windows: jax.Array,
    actions: jax.Array,
    rewards: jax.Array,
    dones: jax.Array,
    idx: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    w = windows[idx]  # [b, num_seq+1]
    obs = frames[w].astype(jnp.float32) / 255.0  # [b, num_seq+1, H, W, C]
    return obs, actions[idx], rewards[idx], dones[idx]


def sample_window_batch(
    state: Dict[str, jax.Array], key: jax.Array, batch_size: int
) -> Dict[str, jax.Array]:
    """Pure sampling function over a buffer ``device_state()`` pytree —
    usable inside a jitted/scanned train loop (on-device batch sampling)."""
    idx = jax.random.randint(key, (batch_size,), 0, state["n"])
    obs, act, rew, done = _gather_windows(
        state["frames"], state["windows"], state["actions"], state["rewards"],
        state["dones"], idx,
    )
    return dict(
        observations=obs,
        actions=act,
        rewards=rew[:, -1],
        terminals=done[:, -1],
    )


class SlacReplayBuffer:
    """Episode-aware sequence replay over an indexed frame pool."""

    # random_batch(key, batch_size): on-device, jax-PRNG-driven sampling.
    # The algorithm loops dispatch on this attribute, NOT on the presence
    # of device_state() (which SimpleReplayBuffer also has, for the scanned
    # state-RL path).
    sampling_style = "key"

    @property
    def scannable(self) -> bool:
        """device_state() is available for in-scan sampling."""
        return True

    def __init__(
        self,
        capacity: int,
        num_sequences: int,
        frame_shape: Tuple[int, int, int],  # (H, W, C)
        action_dim: int,
        frame_capacity: Optional[int] = None,
    ) -> None:
        self.capacity = int(capacity)
        self.num_sequences = int(num_sequences)
        self.frame_shape = tuple(frame_shape)
        self.action_dim = int(action_dim)
        # offline ingestion grows the pool exactly; online appends need slack
        self.frame_capacity = int(frame_capacity or 0)

        # frame pool grows by amortized doubling (_n_frames tracks the live
        # prefix) — a per-append concatenate would be quadratic in stream
        # length
        self._frames = np.zeros((0, *self.frame_shape), np.uint8)
        self._n_frames = 0
        self._windows = np.zeros((self.capacity, self.num_sequences + 1), np.int64)
        self._actions = np.zeros((self.capacity, self.num_sequences, action_dim), np.float32)
        self._rewards = np.zeros((self.capacity, self.num_sequences, 1), np.float32)
        self._dones = np.zeros((self.capacity, self.num_sequences, 1), np.float32)
        self._n = 0
        self._real_n = 0  # slots [0, _real_n) came from the real dataset
        self._device_cache: Optional[Dict[str, jax.Array]] = None

        # online streaming state
        self._ep_frame_start: Optional[int] = None
        self._ep_actions: list = []
        self._ep_rewards: list = []
        self._ep_dones: list = []

    def __len__(self) -> int:
        return self._n

    @property
    def real_n(self) -> int:
        return self._real_n

    def mark_real(self) -> None:
        """Everything ingested so far is 'real' data (reference tsne split,
        slac/algo.py:414-416)."""
        self._real_n = self._n

    # -- frame pool ---------------------------------------------------------
    def _add_frames(self, frames: np.ndarray) -> int:
        """Append frames to the pool, returning the base index."""
        frames = np.asarray(frames, np.uint8)
        assert frames.shape[1:] == self.frame_shape, (
            f"frame shape {frames.shape[1:]} != {self.frame_shape}"
        )
        base = self._n_frames
        need = base + len(frames)
        if need > len(self._frames):
            new_cap = max(need, 2 * len(self._frames), 64)
            grown = np.zeros((new_cap, *self.frame_shape), np.uint8)
            grown[:base] = self._frames[:base]
            self._frames = grown
        self._frames[base:need] = frames
        self._n_frames = need
        self._device_cache = None
        return base

    def _add_slots(
        self,
        windows: np.ndarray,
        actions: np.ndarray,
        rewards: np.ndarray,
        dones: np.ndarray,
    ) -> None:
        k = len(windows)
        if self._n + k > self.capacity:
            raise ValueError(
                f"buffer overflow: {self._n}+{k} > capacity {self.capacity}"
            )
        sl = slice(self._n, self._n + k)
        self._windows[sl] = windows
        self._actions[sl] = actions
        self._rewards[sl] = rewards.reshape(k, self.num_sequences, 1)
        self._dones[sl] = dones.reshape(k, self.num_sequences, 1)
        self._n += k
        self._device_cache = None

    # -- offline ingestion ----------------------------------------------------
    def ingest_real(self, dataset: Dict[str, np.ndarray]) -> int:
        """Streaming-equivalent ingestion of a real dataset
        (reference: slac/algo.py:355-416). One slot per in-episode step
        t >= num_sequences-1, sliding by 1; the dataset's final row is
        dropped iff it is a timeout row (algo.py:363-367). Returns slots
        added."""
        ns = self.num_sequences
        timeouts = np.asarray(dataset["timeouts"]).ravel()
        imgs = dataset["image_observations"]
        imgs_tp1 = dataset["image_observations_tp1"]
        actions = dataset["actions"]
        rewards = np.asarray(dataset["rewards"]).ravel()
        added = 0
        n_rows = len(timeouts)
        eps = list(episode_slices(timeouts))
        # trailing rows past the last timeout still stream in the reference
        tail_start = eps[-1].stop if eps else 0
        if tail_start < n_rows:
            eps.append(slice(tail_start, n_rows))
        for ep in eps:
            start, stop = ep.start, ep.stop
            if stop == n_rows and timeouts[stop - 1] == 1:
                stop -= 1  # reference breaks before appending the last row
            length = stop - start
            if length < ns:
                continue
            # episode frame sequence: F[0]=imgs[start], F[t+1]=imgs_tp1[start+t]
            ep_frames = np.concatenate(
                [imgs[start : start + 1], imgs_tp1[start:stop]], axis=0
            )
            base = self._add_frames(ep_frames)
            # slot at step t (t = ns-1 .. length-1): frames F[t-ns+1 .. t+1]
            t = np.arange(ns - 1, length)[:, None]
            win = base + t - (ns - 1) + np.arange(ns + 1)[None, :]
            step_idx = start + t - (ns - 1) + np.arange(ns)[None, :]
            acts = actions[step_idx]
            rews = rewards[step_idx]
            dones = np.zeros_like(rews)  # mask=False always (algo.py:399-401)
            self._add_slots(win, acts, rews, dones)
            added += len(win)
        return added

    def ingest_generated(
        self,
        dataset: Dict[str, np.ndarray],
        uncertainty_type: Optional[str] = None,
        uncertainty_penalty_lambda: Optional[float] = None,
        generated_frames: Optional[np.ndarray] = None,
    ) -> int:
        """Ingest an augmented 1-step dataset: one slot per valid row — 8
        real context steps + 1 generated step with uncertainty-penalized
        reward (reference: slac/algo.py:278-352). ``generated_frames``
        overrides ``dataset['image_observations_tp1']`` (e.g. frames
        synthesized on-device by the S2P GAN)."""
        ns = self.num_sequences
        obs_idx = np.asarray(dataset["slac_observation_indices"], np.int64)
        act_idx = np.asarray(dataset["slac_action_indices"], np.int64)
        timeouts = np.asarray(dataset["timeouts"]).ravel()
        n_rows = len(obs_idx)

        valid = ~(obs_idx >= SENTINEL).any(axis=1)
        # reference asserts all-or-none sentinels per row (algo.py:289-291)
        partial = (obs_idx >= SENTINEL).any(axis=1) & ~(obs_idx >= SENTINEL).all(axis=1)
        assert not partial.any(), "rows with partial sentinel windows"
        assert (act_idx[valid] == obs_idx[valid, :-1]).all()
        if timeouts[n_rows - 1] == 1:
            valid[n_rows - 1] = False  # break-before-append (algo.py:293-297)
        rows = np.where(valid)[0]
        if len(rows) == 0:
            return 0

        imgs = dataset["image_observations"]
        gen_imgs = (
            np.asarray(generated_frames)
            if generated_frames is not None
            else dataset["image_observations_tp1"]
        )

        # compute penalized rewards BEFORE mutating the frame pool so a bad
        # uncertainty_type leaves the buffer untouched
        reward = np.asarray(dataset["rewards"]).ravel().astype(np.float64)
        if uncertainty_type is not None:
            assert uncertainty_penalty_lambda is not None
            lam = float(uncertainty_penalty_lambda)
            get = lambda k: np.asarray(dataset[k]).reshape(len(reward), -1)[:, 0]
            if uncertainty_type == "aleatoric":
                u = get("aleatoric_uncertainty")
            elif uncertainty_type == "disagreement":
                u = get("disagreement_uncertainty")
            elif uncertainty_type == "max_of_both":
                u = np.maximum(get("aleatoric_uncertainty"), get("disagreement_uncertainty"))
            elif uncertainty_type == "min_of_both":
                u = np.minimum(get("aleatoric_uncertainty"), get("disagreement_uncertainty"))
            elif uncertainty_type == "average_both":
                u = 0.5 * (get("aleatoric_uncertainty") + get("disagreement_uncertainty"))
            else:
                raise NotImplementedError(uncertainty_type)
            reward = reward - lam * u

        base = self._add_frames(imgs)
        gen_base = self._add_frames(gen_imgs)

        # window = 8 real frames (obs_idx[:, :ns]) + generated frame for row i-1
        win = np.concatenate(
            [base + obs_idx[rows, :ns], gen_base + (rows - 1)[:, None]], axis=1
        )
        acts = np.concatenate(
            [
                dataset["original_actions"][act_idx[rows, : ns - 1]],
                dataset["actions"][rows - 1][:, None, :],
            ],
            axis=1,
        )
        rews = np.concatenate(
            [
                np.asarray(dataset["original_rewards"]).ravel()[act_idx[rows, : ns - 1]],
                reward[rows - 1][:, None],
            ],
            axis=1,
        ).astype(np.float32)
        dones = np.zeros_like(rews)  # mask=False always (algo.py:399-401)
        self._add_slots(win, acts, rews, dones)
        return len(rows)

    # -- online streaming (standalone SLAC trainer path) ----------------------
    def reset_episode(self, state: np.ndarray) -> None:
        assert self._ep_frame_start is None, "episode already open"
        self._ep_frame_start = self._add_frames(state[None])
        self._ep_actions, self._ep_rewards, self._ep_dones = [], [], []

    def append(
        self,
        action: np.ndarray,
        reward: float,
        mask: bool,
        next_state: np.ndarray,
        episode_done: bool,
    ) -> None:
        assert self._ep_frame_start is not None, "reset_episode first"
        self._add_frames(next_state[None])
        self._ep_actions.append(np.asarray(action, np.float32))
        self._ep_rewards.append(float(reward))
        self._ep_dones.append(float(mask))
        ns = self.num_sequences
        t = len(self._ep_actions) - 1
        if t >= ns - 1:
            f0 = self._ep_frame_start + t - (ns - 1)
            win = np.arange(f0, f0 + ns + 1)
            sl = slice(t - ns + 1, t + 1)
            self._add_slots(
                win[None],
                np.stack(self._ep_actions[sl])[None],
                np.asarray(self._ep_rewards[sl], np.float32)[None],
                np.asarray(self._ep_dones[sl], np.float32)[None],
            )
        if episode_done:
            self._ep_frame_start = None

    # -- sampling -------------------------------------------------------------
    def device_state(self) -> Dict[str, jax.Array]:
        if self._device_cache is None:
            assert self._n > 0, "empty buffer"
            self._device_cache = dict(
                frames=jnp.asarray(self._frames[: self._n_frames]),
                windows=jnp.asarray(self._windows[: self._n]),
                actions=jnp.asarray(self._actions[: self._n]),
                rewards=jnp.asarray(self._rewards[: self._n]),
                dones=jnp.asarray(self._dones[: self._n]),
                n=jnp.asarray(self._n, jnp.int32),
            )
        return self._device_cache

    def random_batch(self, key: jax.Array, batch_size: int) -> Dict[str, jax.Array]:
        """dict(observations [b, ns+1, H, W, C] float/255, actions [b, ns, A],
        rewards [b, 1], terminals [b, 1]) — reference buffer.py:153-167."""
        return sample_window_batch(self.device_state(), key, batch_size)

    def sample_latent(
        self, key: jax.Array, batch_size: int
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """(obs, actions, full reward/done sequences) for ELBO updates
        (reference buffer.py:127-136)."""
        st = self.device_state()
        idx = jax.random.randint(key, (batch_size,), 0, st["n"])
        return _gather_windows(
            st["frames"], st["windows"], st["actions"], st["rewards"], st["dones"], idx
        )

    def random_batch_real_gen(
        self, key: jax.Array, batch_size: int
    ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
        """Real/generated split sampling (reference buffer.py:170-197)."""
        assert 0 < self._real_n < self._n
        st = self.device_state()
        k1, k2 = jax.random.split(key)
        idx_r = jax.random.randint(k1, (batch_size,), 0, self._real_n)
        idx_g = jax.random.randint(k2, (batch_size,), self._real_n, st["n"])
        out = []
        for idx in (idx_r, idx_g):
            obs, act, rew, done = _gather_windows(
                st["frames"], st["windows"], st["actions"], st["rewards"], st["dones"], idx
            )
            out.append(dict(observations=obs, actions=act, rewards=rew[:, -1], terminals=done[:, -1]))
        return out[0], out[1]

    # rlkit-compat no-ops (reference buffer.py:199-206)
    def get_diagnostics(self) -> Dict[str, float]:
        return {"size": float(self._n), "real_size": float(self._real_n)}

    def get_snapshot(self) -> Dict:
        return {}

    def end_epoch(self, epoch: int) -> None:
        return


class SimpleReplayBuffer:
    """Flat transition buffer with optional uint8 image obs and
    memory-efficient 3-frame-stack next_obs reconstruction
    (reference: rlkit/data_management/simple_replay_buffer.py:9-143)."""

    # random_batch(batch_size, rng=...): host-side numpy sampling.
    sampling_style = "rng"

    @property
    def scannable(self) -> bool:
        """device_state() works (memory-efficient image mode reconstructs
        next_obs at sample time and cannot be folded into a scan)."""
        return not (self.image_buffer and self.memory_efficient)

    def __init__(
        self,
        max_replay_buffer_size: int,
        observation_dim,
        action_dim: int,
        image_buffer: bool = False,
        memory_efficient_way: bool = False,
        frame_stack: int = 3,
    ) -> None:
        self.capacity = int(max_replay_buffer_size)
        self.image_buffer = image_buffer
        self.memory_efficient = memory_efficient_way
        self.frame_stack = frame_stack
        obs_shape = (
            (observation_dim,) if np.isscalar(observation_dim) else tuple(observation_dim)
        )
        obs_dtype = np.uint8 if image_buffer else np.float32
        self._obs = np.zeros((self.capacity, *obs_shape), obs_dtype)
        if image_buffer and memory_efficient_way:
            # store only the newest frame of next_obs (last C/k channels)
            c = obs_shape[-1] // frame_stack
            self._next_obs = np.zeros((self.capacity, *obs_shape[:-1], c), obs_dtype)
        else:
            self._next_obs = np.zeros((self.capacity, *obs_shape), obs_dtype)
        self._actions = np.zeros((self.capacity, action_dim), np.float32)
        self._rewards = np.zeros((self.capacity, 1), np.float32)
        self._terminals = np.zeros((self.capacity, 1), np.float32)
        self._top = 0
        self._size = 0

    def add_sample(self, observation, action, reward, terminal, next_observation) -> None:
        self._obs[self._top] = observation
        if self.image_buffer and self.memory_efficient:
            c = self._next_obs.shape[-1]
            self._next_obs[self._top] = next_observation[..., -c:]
        else:
            self._next_obs[self._top] = next_observation
        self._actions[self._top] = action
        self._rewards[self._top] = reward
        self._terminals[self._top] = terminal
        self._top = (self._top + 1) % self.capacity
        self._size = min(self._size + 1, self.capacity)

    def add_path(self, path: Dict[str, np.ndarray]) -> None:
        for o, a, r, t, no in zip(
            path["observations"], path["actions"], path["rewards"],
            path["terminals"], path["next_observations"],
        ):
            self.add_sample(o, a, r, t, no)

    def add_paths(self, paths) -> None:
        """reference ReplayBuffer.add_paths (data_management/replay_buffer.py)."""
        for path in paths:
            self.add_path(path)

    def random_batch(self, batch_size: int, rng: Optional[np.random.RandomState] = None):
        rng = rng or np.random
        idx = rng.randint(0, self._size, size=batch_size)
        obs = self._obs[idx]
        if self.image_buffer and self.memory_efficient:
            # next = concat(obs[..., C/k:], newest) — reference :115-118
            c = self._next_obs.shape[-1]
            next_obs = np.concatenate([obs[..., c:], self._next_obs[idx]], axis=-1)
        else:
            next_obs = self._next_obs[idx]
        if self.image_buffer:
            obs = obs.astype(np.float32) / 255.0
            next_obs = next_obs.astype(np.float32) / 255.0
        return dict(
            observations=obs,
            actions=self._actions[idx],
            rewards=self._rewards[idx],
            terminals=self._terminals[idx],
            next_observations=next_obs,
        )

    def device_state(self) -> Dict[str, jax.Array]:
        """Live prefix as a device pytree for scanned state-RL training
        (images stay uint8; flat obs float32). Rebuilt per call — callers
        cache across a training loop, not per step."""
        assert self._size > 0, "empty buffer"
        assert not (self.image_buffer and self.memory_efficient), (
            "memory-efficient image mode reconstructs next_obs at sample "
            "time; use the SLAC sequence buffer for device-resident images"
        )
        return dict(
            observations=jnp.asarray(self._obs[: self._size]),
            actions=jnp.asarray(self._actions[: self._size]),
            rewards=jnp.asarray(self._rewards[: self._size]),
            terminals=jnp.asarray(self._terminals[: self._size]),
            next_observations=jnp.asarray(self._next_obs[: self._size]),
            n=jnp.asarray(self._size, jnp.int32),
        )

    def __len__(self) -> int:
        return self._size

    def num_steps_can_sample(self) -> int:
        return self._size

    def get_diagnostics(self) -> Dict[str, float]:
        return {"size": float(self._size)}

    def end_epoch(self, epoch: int) -> None:
        return
