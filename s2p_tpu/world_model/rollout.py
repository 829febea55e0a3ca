"""Synthetic state-transition dataset generation ("extended distribution").

Capability contract (reference: /root/reference/state_transition_rollout.py:
12-247, the ``all_state_1step_random_action`` rollout): for every row of the
real dataset, sample a uniform random action, predict (next_obs, reward)
with the ensemble using one random member per sample, record disagreement /
aleatoric uncertainties, attach SLAC window indices (sentinel for the first
num_sequences steps of each trajectory), and write the augment HDF5 schema
consumed by rlkit/torch/slac/algo.py:168-204.

TPU-first: the reference loops over trajectories and round-trips the GPU per
trajectory (:151-219). Here the ensemble forward + member gather +
uncertainty reductions run as ONE jitted call over the whole dataset
(optionally chunked for memory); the per-trajectory structure only matters
for window indices, which stay host-side numpy.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from s2p_tpu.data.hdf5 import episode_slices, make_slac_window_indices
from s2p_tpu.world_model.ensemble import EnsembleTransition


def compute_normalization(dataset: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """obs/next_obs/reward mean+std — the normalize_configs_dict.pkl contract
    (reference: state_transition_rollout.py:88-96)."""
    out = {}
    for key, name in (
        ("observations", "obs"),
        ("next_observations", "next_obs"),
        ("rewards", "reward"),
    ):
        v = np.asarray(dataset[key], np.float64)
        out[f"{name}_mean"] = v.mean(axis=0).astype(np.float32)
        out[f"{name}_std"] = (v.std(axis=0) + 1e-8).astype(np.float32)
    return out


@partial(jax.jit, static_argnums=(0,))
def _predict(
    model: EnsembleTransition,
    params: Any,
    norm_obs: jax.Array,  # [B, obs]
    actions: jax.Array,  # [B, act]
    member_idx: jax.Array,  # [B] int
):
    mu, std = model.apply(params, jnp.concatenate([norm_obs, actions], axis=-1))
    # per-sample random ensemble member (reference :192-195)
    batch = jnp.arange(mu.shape[1])
    sel_obs = mu[member_idx, batch, : model.obs_dim]
    sel_rew = mu[member_idx, batch, -1]
    # disagreement: max over members of ||μ_e − mean_e μ|| on the obs part
    # (reference :199-203)
    obs_modes = mu[:, :, :-1]
    diff = obs_modes - jnp.mean(obs_modes, axis=0)
    disagreement = jnp.max(jnp.linalg.norm(diff, axis=-1, keepdims=True), axis=0)
    # aleatoric: max over members of ||σ|| on the FULL output (reference :204)
    aleatoric = jnp.max(jnp.linalg.norm(std, axis=-1, keepdims=True), axis=0)
    return sel_obs, sel_rew, disagreement, aleatoric


def generate_augmented_dataset(
    dataset: Dict[str, np.ndarray],
    model: EnsembleTransition,
    params: Any,
    normalization: Dict[str, np.ndarray],
    action_low: np.ndarray,
    action_high: np.ndarray,
    num_sequences: int = 8,
    seed: int = 0,
    chunk: int = 65536,
) -> Dict[str, np.ndarray]:
    """Returns the augment-schema dataset dict (keys as written by the
    reference at state_transition_rollout.py:222-243)."""
    rng = np.random.RandomState(seed)
    obs = np.asarray(dataset["observations"], np.float32)
    n, obs_dim = obs.shape
    act_dim = len(np.asarray(action_low).ravel())

    timeouts = np.asarray(dataset["timeouts"]).ravel()
    assert (np.asarray(dataset.get("terminals", np.zeros(n))) == 0).all(), (
        "assume no terminal states (DMControl datasets, reference :78)"
    )

    norm_obs = (obs - normalization["obs_mean"]) / normalization["obs_std"]
    actions = rng.uniform(
        low=action_low, high=action_high, size=(n, act_dim)
    ).astype(np.float32)
    member_idx = rng.randint(0, model.ensemble_size, size=n)

    outs = {"next": [], "rew": [], "dis": [], "ale": []}
    for lo in range(0, n, chunk):
        sl = slice(lo, min(lo + chunk, n))
        sel_obs, sel_rew, dis, ale = _predict(
            model, params,
            jnp.asarray(norm_obs[sl]), jnp.asarray(actions[sl]),
            jnp.asarray(member_idx[sl]),
        )
        outs["next"].append(np.asarray(jax.device_get(sel_obs)))
        outs["rew"].append(np.asarray(jax.device_get(sel_rew)))
        outs["dis"].append(np.asarray(jax.device_get(dis)))
        outs["ale"].append(np.asarray(jax.device_get(ale)))

    # denormalize (reference :194-195)
    next_obs = np.concatenate(outs["next"]) * normalization["next_obs_std"] + \
        normalization["next_obs_mean"]
    rewards = np.concatenate(outs["rew"]) * normalization["reward_std"] + \
        normalization["reward_mean"]

    obs_idx_list, act_idx_list = [], []
    for sl in episode_slices(timeouts):
        length = sl.stop - sl.start
        o, a = make_slac_window_indices(length, sl.start, num_sequences)
        obs_idx_list.append(o)
        act_idx_list.append(a)

    out = dict(dataset)
    out["original_actions"] = np.asarray(dataset["actions"])
    out["original_rewards"] = np.asarray(dataset["rewards"])
    out["actions"] = actions
    out["rewards"] = rewards.astype(np.float32)
    out["next_observations"] = next_obs.astype(np.float32)
    out["disagreement_uncertainty"] = np.concatenate(outs["dis"]).astype(np.float32)
    out["aleatoric_uncertainty"] = np.concatenate(outs["ale"]).astype(np.float32)
    out["slac_observation_indices"] = np.concatenate(obs_idx_list, axis=0)
    out["slac_action_indices"] = np.concatenate(act_idx_list, axis=0)
    return out


def generate_multistep_dataset(
    dataset: Dict[str, np.ndarray],
    model: EnsembleTransition,
    params: Any,
    normalization: Dict[str, np.ndarray],
    action_low: np.ndarray,
    action_high: np.ndarray,
    horizon: int = 5,
    n_starts: Optional[int] = None,
    action_fn=None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Multi-step rollout variants (reference rollout types
    ``random_state_{1,5}step_random_action`` / ``random_state_5step_
    offRL_action``, slac/algo.py:212): start from random dataset states and
    roll the ensemble ``horizon`` steps with uniform-random actions (or
    ``action_fn(obs) → actions`` for the offRL variant), one random member
    per (sample, step). Returns a flat dataset with ``timeouts`` marking
    each rollout's end plus per-step uncertainties; frames for
    ``image_observations`` come from the starting rows (the GAN renders
    the rest downstream)."""
    rng = np.random.RandomState(seed)
    obs_all = np.asarray(dataset["observations"], np.float32)
    n_rows, obs_dim = obs_all.shape
    act_dim = len(np.asarray(action_low).ravel())
    n_starts = n_starts or n_rows
    starts = rng.randint(0, n_rows, n_starts)

    cur = obs_all[starts]
    rows = {k: [] for k in ("obs", "act", "rew", "next", "dis", "ale")}
    for _ in range(horizon):
        norm_obs = (cur - normalization["obs_mean"]) / normalization["obs_std"]
        if action_fn is not None:
            actions = np.asarray(action_fn(cur), np.float32)
        else:
            actions = rng.uniform(
                action_low, action_high, (n_starts, act_dim)
            ).astype(np.float32)
        member = rng.randint(0, model.ensemble_size, n_starts)
        sel_obs, sel_rew, dis, ale = _predict(
            model, params, jnp.asarray(norm_obs), jnp.asarray(actions),
            jnp.asarray(member),
        )
        nxt = np.asarray(jax.device_get(sel_obs)) * \
            normalization["next_obs_std"] + normalization["next_obs_mean"]
        rew = np.asarray(jax.device_get(sel_rew)) * \
            normalization["reward_std"] + normalization["reward_mean"]
        rows["obs"].append(cur)
        rows["act"].append(actions)
        rows["rew"].append(rew.astype(np.float32))
        rows["next"].append(nxt.astype(np.float32))
        rows["dis"].append(np.asarray(jax.device_get(dis)))
        rows["ale"].append(np.asarray(jax.device_get(ale)))
        cur = nxt.astype(np.float32)

    # interleave to trajectory-major order: rollout i occupies rows
    # [i*horizon, (i+1)*horizon)
    def stack(key):
        return np.stack(rows[key], axis=1).reshape(n_starts * horizon, -1)

    timeouts = np.zeros(n_starts * horizon, np.float32)
    timeouts[horizon - 1 :: horizon] = 1.0
    out = dict(
        observations=stack("obs"),
        actions=stack("act"),
        rewards=stack("rew").ravel(),
        next_observations=stack("next"),
        timeouts=timeouts,
        disagreement_uncertainty=stack("dis").astype(np.float32),
        aleatoric_uncertainty=stack("ale").astype(np.float32),
    )
    if "image_observations" in dataset:
        # starting frame repeated per rollout row; the GAN regenerates the
        # rest autoregressively downstream
        imgs = np.asarray(dataset["image_observations"])[starts]
        out["image_observations"] = np.repeat(imgs, horizon, axis=0)
    return out
