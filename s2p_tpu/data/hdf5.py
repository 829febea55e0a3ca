"""HDF5 dataset IO.

Two dataset schemas flow through the S2P pipeline (SURVEY §1 data-flow):

1. **Real image-RL dataset** (``image_numpy_dataset_stack3_imgsize_100.hdf5``,
   keys read at reference state_transition_rollout.py:61-80): per-transition
   ``observations/actions/rewards/next_observations`` + single-frame
   ``image_observations`` (and ``_tm1``/``_tm2`` for 3-stacks) +
   ``qpos_qvel`` + ``terminals``/``timeouts`` episode delimiters.

2. **Augmented (world-model generated) dataset**
   (``all_state_1step_random_action_dataset_augment.hdf5``, written at
   state_transition_rollout.py:232-243, read at rlkit/torch/slac/algo.py:
   168-204): replaces actions/rewards/next_observations with ensemble
   predictions, carries ``original_actions/original_rewards``,
   ``disagreement_uncertainty``/``aleatoric_uncertainty`` and precomputed
   SLAC window indices with the int(1e9) sentinel for the first
   ``num_sequences`` steps of each trajectory
   (state_transition_rollout.py:105-132). The S2P GAN later adds
   ``image_observations_tp1`` frames for these rows.

Design notes (TPU-first): images are kept **NHWC uint8** end-to-end — the
reference transposes to NCHW on load (slac/algo.py:172-175); we do not.
uint8→float32/255 happens on device inside jitted steps.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import h5py
import numpy as np

SENTINEL = int(1e9)  # reference: state_transition_rollout.py:110


def make_slac_window_indices(
    traj_length: int, traj_start_idx: int, num_sequences: int = 8
) -> tuple:
    """SLAC (num_seq+1)-frame / num_seq-action window indices for one
    trajectory, with the sentinel for the first num_seq steps
    (reference: state_transition_rollout.py:105-132)."""
    assert traj_length > num_sequences, (
        f"traj length {traj_length} must exceed num_sequences {num_sequences}"
    )
    steps = np.arange(traj_length)[:, None]
    obs_offsets = np.arange(num_sequences + 1)[None, :]
    obs = steps - num_sequences + obs_offsets + traj_start_idx
    act = obs[:, :-1].copy()
    invalid = steps[:, 0] < num_sequences
    obs[invalid] = SENTINEL
    act[invalid] = SENTINEL
    return obs.astype(np.int64), act.astype(np.int64)


def episode_slices(timeouts: np.ndarray) -> Sequence[slice]:
    """Split a flat dataset into per-episode slices at timeout==1 rows
    (reference trajectory loop: state_transition_rollout.py:151-168)."""
    ends = np.sort(np.where(np.asarray(timeouts).ravel() == 1)[0])
    out, start = [], 0
    for e in ends:
        out.append(slice(start, int(e) + 1))
        start = int(e) + 1
    return out


_RL_KEYS = (
    "observations",
    "actions",
    "rewards",
    "next_observations",
    "image_observations",
    "timeouts",
)
_RL_OPTIONAL = (
    "terminals",
    "image_observations_tm1",
    "image_observations_tm2",
    "image_observations_tp1",
    "qpos_qvel",
)

_AUG_KEYS = (
    "observations",
    "actions",
    "rewards",
    "next_observations",
    "timeouts",
    "original_actions",
    "original_rewards",
    "slac_observation_indices",
    "slac_action_indices",
    "disagreement_uncertainty",
    "aleatoric_uncertainty",
)
_AUG_OPTIONAL = ("image_observations", "image_observations_tp1", "qpos_qvel")


def _load(path: str, keys, optional, data_num: Optional[int]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    sl = slice(None) if data_num is None else slice(data_num)
    with h5py.File(path, "r") as f:
        for k in keys:
            if k not in f:
                raise KeyError(f"{path} missing required dataset {k!r}")
            out[k] = f[k][sl]
        for k in optional:
            if k in f:
                out[k] = f[k][sl]
    # reference squeezes 2-D rewards (state_transition_rollout.py:84-86)
    for k in ("rewards", "original_rewards"):
        if k in out and out[k].ndim == 2 and out[k].shape[1] == 1:
            out[k] = out[k].squeeze(-1)
    return out


def load_rl_dataset(path: str, data_num: Optional[int] = None) -> Dict[str, np.ndarray]:
    return _load(path, _RL_KEYS, _RL_OPTIONAL, data_num)


_STATE_KEYS = (
    "observations",
    "actions",
    "rewards",
    "next_observations",
    "timeouts",
)


def load_state_dataset(path: str, data_num: Optional[int] = None) -> Dict[str, np.ndarray]:
    """State-only dataset (collect_dataset.py output): the state-RL path
    (iql_trainer.py:276-301 analog) needs no image keys."""
    return _load(path, _STATE_KEYS,
                 ("image_observations",) + _RL_OPTIONAL, data_num)


def load_augment_dataset(
    path: str, data_num: Optional[int] = None
) -> Dict[str, np.ndarray]:
    return _load(path, _AUG_KEYS, _AUG_OPTIONAL, data_num)


def save_dataset(path: str, dataset: Dict[str, np.ndarray]) -> None:
    """Write a dataset dict (reference: state_transition_rollout.py:232-243)."""
    with h5py.File(path, "w") as f:
        for k, v in dataset.items():
            f.create_dataset(str(k), data=np.asarray(v))


# ---------------------------------------------------------------------------
# synthetic fixtures (testing without the stripped real blobs, SURVEY §0)
# ---------------------------------------------------------------------------

def make_synthetic_rl_dataset(
    n_episodes: int = 3,
    episode_len: int = 20,
    obs_dim: int = 17,
    act_dim: int = 6,
    img_hw: int = 16,
    seed: int = 0,
    with_tp1: bool = True,
) -> Dict[str, np.ndarray]:
    """A tiny, schema-faithful stand-in for the 500k-transition dataset."""
    rng = np.random.RandomState(seed)
    n = n_episodes * episode_len
    timeouts = np.zeros(n, np.float32)
    timeouts[episode_len - 1 :: episode_len] = 1.0
    imgs = rng.randint(0, 256, size=(n, img_hw, img_hw, 3), dtype=np.uint8)
    ds = dict(
        observations=rng.randn(n, obs_dim).astype(np.float32),
        actions=rng.uniform(-1, 1, size=(n, act_dim)).astype(np.float32),
        rewards=rng.rand(n).astype(np.float32),
        next_observations=rng.randn(n, obs_dim).astype(np.float32),
        terminals=np.zeros(n, np.float32),
        timeouts=timeouts,
        image_observations=imgs,
    )
    if with_tp1:
        # next frame = following row's frame within an episode; last row's
        # tp1 frame is fresh noise
        tp1 = np.concatenate([imgs[1:], imgs[-1:]], axis=0).copy()
        ds["image_observations_tp1"] = tp1
    return ds
