"""Data-layer tests: HDF5 schemas, window indices, replay ingestion.

The ingestion tests validate the vectorized TPU buffer against a direct
re-enactment of the reference's Python-loop semantics
(rlkit/torch/slac/algo.py:278-416) — the golden-oracle pattern of SURVEY §4.
"""

import jax
import numpy as np
import pytest

from s2p_tpu.data import (
    S2PPairDataset,
    SimpleReplayBuffer,
    SlacReplayBuffer,
    load_augment_dataset,
    load_rl_dataset,
    make_slac_window_indices,
    save_dataset,
)
from s2p_tpu.data.hdf5 import SENTINEL, episode_slices, make_synthetic_rl_dataset

NS = 8  # num_sequences


def make_augment_dataset(rl_ds, seed=1):
    """Build a schema-faithful augment dataset from a synthetic RL dataset,
    following state_transition_rollout.py:105-243."""
    rng = np.random.RandomState(seed)
    n = len(rl_ds["timeouts"])
    obs_list, act_list = [], []
    for ep in episode_slices(rl_ds["timeouts"]):
        o, a = make_slac_window_indices(ep.stop - ep.start, ep.start, NS)
        obs_list.append(o)
        act_list.append(a)
    act_dim = rl_ds["actions"].shape[1]
    hw = rl_ds["image_observations"].shape[1]
    return dict(
        observations=rl_ds["observations"],
        actions=rng.uniform(-1, 1, (n, act_dim)).astype(np.float32),
        rewards=rng.rand(n).astype(np.float32),
        next_observations=rng.randn(*rl_ds["next_observations"].shape).astype(np.float32),
        timeouts=rl_ds["timeouts"],
        original_actions=rl_ds["actions"],
        original_rewards=rl_ds["rewards"],
        slac_observation_indices=np.concatenate(obs_list),
        slac_action_indices=np.concatenate(act_list),
        disagreement_uncertainty=rng.rand(n, 1).astype(np.float32),
        aleatoric_uncertainty=rng.rand(n, 1).astype(np.float32),
        image_observations=rl_ds["image_observations"],
        image_observations_tp1=rng.randint(0, 256, (n, hw, hw, 3), dtype=np.uint8),
    )


class TestWindowIndices:
    def test_sentinels_and_offsets(self):
        obs, act = make_slac_window_indices(12, traj_start_idx=100, num_sequences=NS)
        assert obs.shape == (12, NS + 1) and act.shape == (12, NS)
        assert (obs[:NS] == SENTINEL).all() and (act[:NS] == SENTINEL).all()
        np.testing.assert_array_equal(obs[NS], np.arange(100, 100 + NS + 1))
        np.testing.assert_array_equal(act[11], np.arange(100 + 3, 100 + 3 + NS))
        np.testing.assert_array_equal(act[NS:], obs[NS:, :-1])

    def test_too_short_trajectory_raises(self):
        with pytest.raises(AssertionError):
            make_slac_window_indices(NS, 0, NS)


class TestHdf5Roundtrip:
    def test_rl_dataset(self, tmp_path):
        ds = make_synthetic_rl_dataset()
        p = str(tmp_path / "rl.hdf5")
        save_dataset(p, ds)
        back = load_rl_dataset(p)
        np.testing.assert_array_equal(back["image_observations"], ds["image_observations"])
        back5 = load_rl_dataset(p, data_num=5)
        assert len(back5["actions"]) == 5

    def test_missing_key_raises(self, tmp_path):
        p = str(tmp_path / "bad.hdf5")
        save_dataset(p, {"observations": np.zeros((3, 2))})
        with pytest.raises(KeyError):
            load_rl_dataset(p)

    def test_reward_squeeze(self, tmp_path):
        ds = make_synthetic_rl_dataset()
        ds["rewards"] = ds["rewards"][:, None]
        p = str(tmp_path / "sq.hdf5")
        save_dataset(p, ds)
        assert load_rl_dataset(p)["rewards"].ndim == 1

    def test_augment_dataset(self, tmp_path):
        ds = make_augment_dataset(make_synthetic_rl_dataset())
        p = str(tmp_path / "aug.hdf5")
        save_dataset(p, ds)
        back = load_augment_dataset(p)
        assert "slac_observation_indices" in back


def reference_ingest_real(ds, ns=NS):
    """Python-loop re-enactment of slac/algo.py:355-416 (real path)."""
    from collections import deque

    slots = []
    n = len(ds["timeouts"])
    state_ = deque(maxlen=ns + 1)
    act_ = deque(maxlen=ns)
    rew_ = deque(maxlen=ns)
    state_.append(ds["image_observations"][0])
    for i in range(n):
        if i == n - 1 and ds["timeouts"][i]:
            break
        state_.append(ds["image_observations_tp1"][i])
        act_.append(ds["actions"][i])
        rew_.append(ds["rewards"][i])
        if len(rew_) == ns:
            slots.append(
                (np.array(state_), np.array(act_), np.array(rew_, np.float32))
            )
        if ds["timeouts"][i]:
            state_.clear()
            act_.clear()
            rew_.clear()
            if i < n - 1:
                state_.append(ds["image_observations"][i + 1])
    return slots


class TestSlacBufferRealIngestion:
    def test_matches_reference_loop(self):
        ds = make_synthetic_rl_dataset(n_episodes=3, episode_len=15, img_hw=8)
        ref_slots = reference_ingest_real(ds)

        buf = SlacReplayBuffer(256, NS, (8, 8, 3), ds["actions"].shape[1])
        added = buf.ingest_real(ds)
        # 8 slots per full episode (L - NS + 1), final episode drops its
        # timeout row (L=14 -> 7 slots)
        assert added == len(ref_slots) == 2 * (15 - NS + 1) + (14 - NS + 1)

        for k in range(added):
            frames = buf._frames[buf._windows[k]]
            np.testing.assert_array_equal(frames, ref_slots[k][0])
            np.testing.assert_array_equal(buf._actions[k], ref_slots[k][1])
            np.testing.assert_allclose(buf._rewards[k, :, 0], ref_slots[k][2])
            assert (buf._dones[k] == 0).all()

    def test_final_row_timeout_dropped(self):
        ds = make_synthetic_rl_dataset(n_episodes=1, episode_len=12, img_hw=8)
        buf = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
        # last row is a timeout -> excluded, so windows at t=7..10 only
        assert buf.ingest_real(ds) == 11 - NS + 1

    def test_trailing_partial_episode_streams(self):
        ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=15, img_hw=8)
        # cut the dataset mid-second-episode: 15 + 10 rows, no final timeout
        ds = {k: v[:25] for k, v in ds.items()}
        buf = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
        assert buf.ingest_real(ds) == (15 - NS + 1) + (10 - NS + 1)


def reference_ingest_generated(aug, lam, utype, ns=NS):
    """Python-loop re-enactment of slac/algo.py:278-352 (generated path)."""
    slots = []
    n = len(aug["timeouts"])
    for i in range(n):
        oi = aug["slac_observation_indices"][i]
        if (oi >= SENTINEL).any():
            continue
        if i == n - 1 and aug["timeouts"][i]:
            break
        frames, acts, rews = [aug["image_observations"][oi[0]]], [], []
        for j in range(ns):
            if j == ns - 1:
                acts.append(aug["actions"][i - 1])
                u = {
                    "aleatoric": aug["aleatoric_uncertainty"][i - 1, 0],
                    "disagreement": aug["disagreement_uncertainty"][i - 1, 0],
                }[utype]
                rews.append(aug["rewards"][i - 1] - lam * u)
                frames.append(aug["image_observations_tp1"][i - 1])
            else:
                acts.append(aug["original_actions"][oi[j]])
                rews.append(aug["original_rewards"][oi[j]])
                frames.append(aug["image_observations"][oi[j + 1]])
        slots.append((np.array(frames), np.array(acts), np.array(rews, np.float32)))
    return slots


class TestSlacBufferGeneratedIngestion:
    @pytest.mark.parametrize("utype", ["aleatoric", "disagreement"])
    def test_matches_reference_loop(self, utype):
        rl = make_synthetic_rl_dataset(n_episodes=3, episode_len=15, img_hw=8)
        aug = make_augment_dataset(rl)
        ref_slots = reference_ingest_generated(aug, lam=2.0, utype=utype)

        buf = SlacReplayBuffer(256, NS, (8, 8, 3), 6)
        added = buf.ingest_generated(
            aug, uncertainty_type=utype, uncertainty_penalty_lambda=2.0
        )
        assert added == len(ref_slots)
        for k in range(added):
            frames = buf._frames[buf._windows[k]]
            np.testing.assert_array_equal(frames, ref_slots[k][0])
            np.testing.assert_array_equal(buf._actions[k], ref_slots[k][1])
            np.testing.assert_allclose(buf._rewards[k, :, 0], ref_slots[k][2], rtol=1e-5)

    def test_combined_uncertainties(self):
        rl = make_synthetic_rl_dataset(n_episodes=2, episode_len=12, img_hw=8)
        aug = make_augment_dataset(rl)
        rewards = {}
        for ut in ["max_of_both", "min_of_both", "average_both"]:
            buf = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
            buf.ingest_generated(aug, uncertainty_type=ut, uncertainty_penalty_lambda=2.0)
            rewards[ut] = buf._rewards[: len(buf), -1, 0].copy()
        assert (rewards["max_of_both"] <= rewards["min_of_both"] + 1e-6).all()
        np.testing.assert_allclose(
            rewards["average_both"],
            0.5 * (rewards["max_of_both"] + rewards["min_of_both"]),
            rtol=1e-5,
        )

    def test_lambda_required_with_uncertainty(self):
        rl = make_synthetic_rl_dataset(n_episodes=1, episode_len=12, img_hw=8)
        aug = make_augment_dataset(rl)
        buf = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
        with pytest.raises(AssertionError):
            buf.ingest_generated(aug, uncertainty_type="aleatoric")


class TestSampling:
    def _filled_buffer(self):
        rl = make_synthetic_rl_dataset(n_episodes=3, episode_len=15, img_hw=8)
        buf = SlacReplayBuffer(256, NS, (8, 8, 3), 6)
        buf.ingest_real(rl)
        buf.mark_real()
        aug = make_augment_dataset(rl)
        buf.ingest_generated(aug, uncertainty_type="aleatoric", uncertainty_penalty_lambda=2.0)
        return buf

    def test_random_batch_contract(self):
        buf = self._filled_buffer()
        b = buf.random_batch(jax.random.key(0), 16)
        assert b["observations"].shape == (16, NS + 1, 8, 8, 3)
        assert b["actions"].shape == (16, NS, 6)
        assert b["rewards"].shape == (16, 1) and b["terminals"].shape == (16, 1)
        assert float(b["observations"].max()) <= 1.0
        assert (np.asarray(b["terminals"]) == 0).all()

    def test_real_gen_split(self):
        buf = self._filled_buffer()
        real, gen = buf.random_batch_real_gen(jax.random.key(1), 8)
        assert real["observations"].shape == gen["observations"].shape

    def test_sampling_inside_jit(self):
        from s2p_tpu.data.replay import sample_window_batch

        buf = self._filled_buffer()
        st = buf.device_state()

        @jax.jit
        def step(state, key):
            batch = sample_window_batch(state, key, 4)
            return batch["observations"].mean()

        v = step(st, jax.random.key(2))
        assert np.isfinite(float(v))

    def test_online_streaming_matches_offline(self):
        ds = make_synthetic_rl_dataset(n_episodes=1, episode_len=14, img_hw=8)
        off = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
        off.ingest_real(ds)
        on = SlacReplayBuffer(64, NS, (8, 8, 3), 6)
        on.reset_episode(ds["image_observations"][0])
        for i in range(13):  # reference drops the final timeout row
            on.append(
                ds["actions"][i], ds["rewards"][i], False,
                ds["image_observations_tp1"][i], episode_done=False,
            )
        assert len(on) == len(off)
        for k in range(len(on)):
            np.testing.assert_array_equal(
                on._frames[on._windows[k]], off._frames[off._windows[k]]
            )

    def test_overflow_raises(self):
        ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=15, img_hw=8)
        buf = SlacReplayBuffer(5, NS, (8, 8, 3), 6)
        with pytest.raises(ValueError):
            buf.ingest_real(ds)


class TestSimpleReplayBuffer:
    def test_memory_efficient_framestack(self):
        buf = SimpleReplayBuffer(
            100, (8, 8, 9), 3, image_buffer=True, memory_efficient_way=True
        )
        rng = np.random.RandomState(0)
        obs = rng.randint(0, 256, (8, 8, 9), np.uint8)
        next_obs = np.concatenate(
            [obs[..., 3:], rng.randint(0, 256, (8, 8, 3), np.uint8)], axis=-1
        )
        buf.add_sample(obs, np.zeros(3), 1.0, 0.0, next_obs)
        batch = buf.random_batch(4, rng)
        np.testing.assert_allclose(
            batch["next_observations"][0], next_obs.astype(np.float32) / 255.0
        )
        # memory check: stored next_obs holds only 3 channels
        assert buf._next_obs.shape[-1] == 3

    def test_ring_overwrite(self):
        buf = SimpleReplayBuffer(4, 2, 1)
        for i in range(6):
            buf.add_sample(np.full(2, i), [i], i, 0.0, np.full(2, i + 1))
        assert len(buf) == 4
        batch = buf.random_batch(32, np.random.RandomState(0))
        assert batch["observations"].min() >= 2  # oldest two overwritten


class TestPairDataset:
    def test_from_dataset_with_tp1(self):
        ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=10, img_hw=8)
        pd = S2PPairDataset.from_dataset(ds)
        assert len(pd) == 20
        np.testing.assert_array_equal(pd.prev_images[0], ds["image_observations"][0])
        np.testing.assert_array_equal(pd.target_images[0], ds["image_observations_tp1"][0])
        np.testing.assert_array_equal(pd.states[0], ds["next_observations"][0])

    def test_consecutive_pairing_skips_episode_ends(self):
        ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=10, img_hw=8, with_tp1=False)
        pd = S2PPairDataset.from_dataset(ds)
        assert len(pd) == 18  # 19 consecutive pairs minus 1 episode boundary

    def test_batches_cover_epoch(self):
        ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=10, img_hw=8)
        pd = S2PPairDataset.from_dataset(ds)
        seen = 0
        for b in pd.batches(6, np.random.RandomState(0)):
            assert b["prev_image"].shape == (6, 8, 8, 3)
            assert b["state"].shape == (6, pd.state_dim)
            seen += 6
        assert seen == 18  # drop_last


def test_load_state_dataset_without_images(tmp_path):
    """collect_dataset.py output has no image keys; the state-RL loader
    accepts it (load_rl_dataset requires image_observations)."""
    import h5py
    import pytest as _pytest

    from s2p_tpu.data.hdf5 import load_rl_dataset, load_state_dataset

    p = str(tmp_path / "state.hdf5")
    n = 12
    rs = np.random.RandomState(0)
    with h5py.File(p, "w") as f:
        f["observations"] = rs.randn(n, 4).astype(np.float32)
        f["actions"] = rs.randn(n, 2).astype(np.float32)
        f["rewards"] = rs.rand(n).astype(np.float32)
        f["next_observations"] = rs.randn(n, 4).astype(np.float32)
        f["timeouts"] = np.zeros(n, np.float32)
        f["terminals"] = np.zeros(n, np.float32)
    ds = load_state_dataset(p, 8)
    assert len(ds["observations"]) == 8 and "terminals" in ds
    with _pytest.raises(KeyError):
        load_rl_dataset(p)
