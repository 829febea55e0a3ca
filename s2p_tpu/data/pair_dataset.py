"""State–image pair dataset for S2P GAN training.

The GAN consumes (prev_image i_t, state s_{t+1}, target_image i_{t+1})
triplets from the same 50k-transition HDF5 the offline RL consumer uses
(reference spec: rebuttal.md:46-47; CLI README.md:56-60
``train.py --dataroot=./datasets/cheetah.hdf5``). Pairs never cross episode
boundaries (the previous image of the first step of an episode belongs to a
different rollout).

TPU-first: the whole dataset is staged once (uint8 NHWC + float32 states) and
batches are produced as device-resident arrays via an epoch-shuffled index
iterator; uint8→[-1, 1] normalization happens inside the jitted train step.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from s2p_tpu.data.hdf5 import load_rl_dataset


class S2PPairDataset:
    def __init__(
        self,
        prev_images: np.ndarray,  # [N, H, W, C] uint8  (i_t)
        states: np.ndarray,  # [N, S] float32          (s_{t+1})
        target_images: np.ndarray,  # [N, H, W, C] uint8 (i_{t+1})
        env_ids: Optional[np.ndarray] = None,  # [N] int32, 0-based env index
    ) -> None:
        assert len(prev_images) == len(states) == len(target_images)
        self.prev_images = np.ascontiguousarray(prev_images, np.uint8)
        self.states = np.ascontiguousarray(states, np.float32)
        self.target_images = np.ascontiguousarray(target_images, np.uint8)
        if env_ids is None:
            env_ids = np.zeros(len(states), np.int32)
        assert len(env_ids) == len(states)
        self.env_ids = np.ascontiguousarray(env_ids, np.int32)

    def __len__(self) -> int:
        return len(self.states)

    @property
    def state_dim(self) -> int:
        return self.states.shape[-1]

    @property
    def image_shape(self) -> Tuple[int, int, int]:
        return self.target_images.shape[1:]

    @classmethod
    def from_hdf5(cls, path: str, data_num: Optional[int] = None) -> "S2PPairDataset":
        """``path`` may be comma-separated for multi-env training (the
        cheetah+walker data-parallel config, BASELINE.json); states are
        zero-padded to the widest env's dimension."""
        parts = [p for p in str(path).split(",") if p]
        if len(parts) > 1:
            return cls.concat([cls.from_hdf5(p, data_num) for p in parts])
        ds = load_rl_dataset(parts[0], data_num)
        return cls.from_dataset(ds)

    @classmethod
    def concat(cls, datasets: "list[S2PPairDataset]") -> "S2PPairDataset":
        assert len({d.image_shape for d in datasets}) == 1, (
            "multi-env training requires a common image size"
        )
        sdim = max(d.state_dim for d in datasets)

        def pad(s: np.ndarray) -> np.ndarray:
            if s.shape[-1] == sdim:
                return s
            out = np.zeros((len(s), sdim), np.float32)
            out[:, : s.shape[-1]] = s
            return out

        return cls(
            np.concatenate([d.prev_images for d in datasets]),
            np.concatenate([pad(d.states) for d in datasets]),
            np.concatenate([d.target_images for d in datasets]),
            # env id = position in the dataroot list (logged by the CLI),
            # so multi-env eval can report per-env fidelity columns
            np.concatenate([
                np.full(len(d), i, np.int32) for i, d in enumerate(datasets)
            ]),
        )

    @classmethod
    def from_dataset(cls, ds: Dict[str, np.ndarray]) -> "S2PPairDataset":
        timeouts = np.asarray(ds["timeouts"]).ravel()
        if "image_observations_tp1" in ds:
            prev = ds["image_observations"]
            target = ds["image_observations_tp1"]
            states = ds["next_observations"]
            keep = np.ones(len(timeouts), bool)
        else:
            # fall back to consecutive-row pairing; a pair (t, t+1) is valid
            # only when row t is not an episode end
            prev = ds["image_observations"][:-1]
            target = ds["image_observations"][1:]
            states = ds["next_observations"][:-1]
            keep = timeouts[:-1] == 0
        return cls(prev[keep], states[keep], target[keep])

    def batches(
        self,
        batch_size: int,
        rng: np.random.RandomState,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """One epoch of shuffled batches (host numpy; device_put at the
        train-step boundary)."""
        order = rng.permutation(len(self))
        stop = len(self) - (len(self) % batch_size if drop_last else 0)
        for lo in range(0, stop, batch_size):
            idx = order[lo : lo + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            yield dict(
                prev_image=self.prev_images[idx],
                state=self.states[idx],
                target_image=self.target_images[idx],
            )

    def eval_batch(self, start: int, n: int) -> Dict[str, np.ndarray]:
        sl = slice(start, start + n)
        return dict(
            prev_image=self.prev_images[sl],
            state=self.states[sl],
            target_image=self.target_images[sl],
        )

    @property
    def n_envs(self) -> int:
        return int(self.env_ids.max()) + 1 if len(self.env_ids) else 1

    def env_subset(self, env_id: int, n: Optional[int] = None) -> "S2PPairDataset":
        """The first ``n`` pairs belonging to ``env_id`` (all when n=None).
        Used by multi-env eval: the concatenated dataset's head is entirely
        the first dataroot, so a head slice alone would silently measure
        one env."""
        idx = np.flatnonzero(self.env_ids == env_id)
        if n is not None:
            idx = idx[:n]
        return S2PPairDataset(
            self.prev_images[idx], self.states[idx],
            self.target_images[idx], self.env_ids[idx],
        )
