"""Envs, samplers, and the batch RL loop — including a tiny end-to-end
offline IQL+SLAC run (the run_iql_image.sh flagship path, SURVEY §3.1)."""

import os
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.envs import NormalizedBoxEnv, StubEnv
from s2p_tpu.samplers import MdpPathCollector, PolicyAgent, SlacObservation, rollout
from s2p_tpu.samplers.agents import RandomAgent

ACT = 2


def test_stub_env_api():
    env = StubEnv(obs_dim=4, action_dim=ACT, max_episode_steps=5)
    o = env.reset()
    assert o.shape == (4,)
    for t in range(5):
        o, r, done, info = env.step(env.action_space.sample())
    assert done and info["TimeLimit.truncated"]


def test_normalized_box_env_rescales_actions():
    class RecordEnv(StubEnv):
        def step(self, action):
            self.last_action = np.asarray(action)
            return super().step(action)

    inner = RecordEnv(action_dim=1)
    inner.action_space.low[:] = 0.0
    inner.action_space.high[:] = 10.0
    env = NormalizedBoxEnv(inner)
    env.reset()
    env.step(np.array([0.0]))  # midpoint of [-1,1] → 5.0
    np.testing.assert_allclose(inner.last_action, [5.0])
    env.step(np.array([1.0]))
    np.testing.assert_allclose(inner.last_action, [10.0])


def test_slac_observation_window():
    ob = SlacObservation((3,), (ACT,), num_sequences=4)
    ob.reset_episode(np.full(3, 9, np.uint8))
    assert ob.state.shape == (4, 3)
    assert (ob.state[:3] == 0).all() and (ob.state[3] == 9).all()
    assert ob.action.shape == (3 * ACT,)
    ob.append(np.full(3, 7, np.uint8), np.ones(ACT))
    assert (ob.state[3] == 7).all() and (ob.state[2] == 9).all()
    # same-obs reset variant
    ob2 = SlacObservation((3,), (ACT,), 4, reset_w_same_obs=True)
    ob2.reset_episode(np.full(3, 5, np.uint8))
    assert (ob2.state == 5).all()


def test_rollout_timelimit_terminal_split():
    env = StubEnv(obs_dim=4, action_dim=ACT, max_episode_steps=5)
    path = rollout(env, RandomAgent(env.action_space), max_path_length=10)
    assert len(path["actions"]) == 5
    assert path["dones"][-1] and not path["terminals"][-1]  # truncation ≠ terminal
    assert path["rewards"].shape == (5, 1)


def test_path_collector_budget_and_diagnostics():
    env = StubEnv(obs_dim=4, action_dim=ACT, max_episode_steps=5)
    col = MdpPathCollector(env, RandomAgent(env.action_space))
    paths = col.collect_new_paths(
        max_path_length=5, num_steps=12, discard_incomplete_paths=False
    )
    assert sum(len(p["actions"]) for p in paths) >= 12
    d = col.get_diagnostics()
    assert d["num steps total"] >= 12
    assert "path length Mean" in d
    snap = col.get_snapshot()
    assert "policy" in snap and "env" in snap
    col.end_epoch(0)
    assert len(col.get_epoch_paths()) == 0


def test_policy_agent_get_action():
    from s2p_tpu.rl import TanhGaussianPolicy

    pol = TanhGaussianPolicy(hidden_sizes=(8,), action_dim=ACT)
    params = pol.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    agent = PolicyAgent(pol, params, deterministic=True)
    a, info = agent.get_action(np.zeros(4, np.float32))
    assert a.shape == (ACT,)
    a2, _ = agent.get_action(np.zeros(4, np.float32))
    np.testing.assert_array_equal(a, a2)  # deterministic
    stoch = PolicyAgent(pol, params, deterministic=False)
    s1, _ = stoch.get_action(np.zeros(4, np.float32))
    s2, _ = stoch.get_action(np.zeros(4, np.float32))
    assert not np.array_equal(s1, s2)


@pytest.mark.slow
def test_offline_iql_slac_end_to_end(tmp_path):
    """Tiny run_iql_image.sh analog: generated+real data in the SLAC buffer,
    offline epochs, eval rollouts on a stub image env, csv + snapshots
    (SURVEY §3.1)."""
    from s2p_tpu.core import BatchRLAlgorithm
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset
    from s2p_tpu.rl import CriticSLAC, IQLTrainer, TanhGaussianPolicy
    from s2p_tpu.slac import SlacAlgorithm
    from s2p_tpu.utils.logging import Logger

    ns, hw = 4, 64
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=200, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=hw, seed=0,
    )
    ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=8, obs_dim=5,
                                   act_dim=ACT, img_hw=hw)
    slac.buffer.ingest_real(ds)
    slac.buffer.mark_real()

    policy = TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT)
    critic = CriticSLAC(hidden_sizes=(16,))
    trainer = IQLTrainer(
        policy=policy, critic=critic, obs_dim=4 + 8,
        policy_input_dim=slac.feature_action_dim, action_dim=ACT,
        slac_algo=slac, freeze_slac=True,
    )

    env = StubEnv(action_dim=ACT, max_episode_steps=6,
                  image_shape=(hw, hw, 3))
    eval_agent = PolicyAgent(policy, trainer.policy_state.params,
                             deterministic=True)
    expl_agent = PolicyAgent(policy, trainer.policy_state.params)
    eval_col = MdpPathCollector(env, eval_agent, slac_algo=slac)
    expl_col = MdpPathCollector(
        StubEnv(action_dim=ACT, max_episode_steps=6, image_shape=(hw, hw, 3)),
        expl_agent, slac_algo=slac,
    )

    log = Logger()
    log.set_log_dir(str(tmp_path / "run"))
    log.set_snapshot_mode("gap_and_last")
    log.set_print_tabular(False)
    algo = BatchRLAlgorithm(
        trainer=trainer,
        exploration_env=expl_col.env, evaluation_env=env,
        exploration_data_collector=expl_col,
        evaluation_data_collector=eval_col,
        replay_buffer=slac.buffer,
        batch_size=4, max_path_length=6, num_epochs=1,
        num_eval_steps_per_epoch=6, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=2, start_epoch=-2,
        slac_representation=True, logger=log, snapshot_gap=1,
    )
    algo.train()
    run_dir = str(tmp_path / "run")
    assert osp.exists(osp.join(run_dir, "progress.csv"))
    with open(osp.join(run_dir, "progress.csv")) as f:
        header = f.readline().strip().split(",")
        rows = f.readlines()
    assert len(rows) == 3  # epochs -2, -1, 0
    assert "eval/Average Returns" in header
    assert any(c.startswith("time/training") for c in header)
    assert osp.exists(osp.join(run_dir, "params.pkl"))
    assert osp.exists(osp.join(run_dir, "rewards_list.pkl"))
    assert trainer._n_train_steps_total == 6


def test_video_dump(tmp_path):
    from s2p_tpu.core import dump_video

    env = StubEnv(obs_dim=4, action_dim=ACT, max_episode_steps=4)
    path = dump_video(
        env, RandomAgent(env.action_space),
        str(tmp_path / "v.mp4"), horizon=4,
    )
    assert path is not None and osp.exists(path)


@pytest.mark.slow
def test_dual_buffer_concat_sampling(tmp_path):
    """50/50 real/generated batches in the non-scan loop (use_seperate_buffer
    path, reference batch_rl_algorithm.py:131-136)."""
    from s2p_tpu.core import BatchRLAlgorithm
    from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset
    from s2p_tpu.rl import CriticSLAC, IQLTrainer, TanhGaussianPolicy
    from s2p_tpu.slac import SlacAlgorithm
    from s2p_tpu.utils.logging import Logger

    ns, hw = 4, 64
    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=ns, buffer_size=100, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=hw, use_seperate_buffer=True, seed=0,
    )
    slac.buffer.ingest_real(make_synthetic_rl_dataset(
        n_episodes=1, episode_len=8, obs_dim=5, act_dim=ACT, img_hw=hw))
    slac.buffer_gen.ingest_real(make_synthetic_rl_dataset(
        n_episodes=1, episode_len=8, obs_dim=5, act_dim=ACT, img_hw=hw, seed=1))
    policy = TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT)
    tr = IQLTrainer(
        policy=policy, critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=4 + 8, policy_input_dim=slac.feature_action_dim,
        action_dim=ACT, slac_algo=slac, freeze_slac=True,
    )
    env = StubEnv(action_dim=ACT, max_episode_steps=4, image_shape=(hw, hw, 3))
    agent = PolicyAgent(policy, tr.policy_state.params, deterministic=True)
    log = Logger()
    log.set_log_dir(str(tmp_path / "run"))
    log.set_print_tabular(False)
    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent, slac_algo=slac),
        evaluation_data_collector=MdpPathCollector(env, agent, slac_algo=slac),
        replay_buffer=slac.buffer, replay_buffer_gen=slac.buffer_gen,
        batch_size=8, max_path_length=4, num_epochs=1,
        num_eval_steps_per_epoch=4, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=2, start_epoch=0,
        slac_representation=True, logger=log,
    )
    algo.train()
    assert tr._n_train_steps_total == 2
