"""Buffer sampling-style dispatch through every algorithm loop.

Regression coverage for the round-1 bug: SimpleReplayBuffer grew a
``device_state()`` method (for the scanned state-RL path) which flipped the
loops' ``hasattr(buffer, "device_state")`` dispatch and sent rng-style
buffers down the key-driven branch. The loops now dispatch on the explicit
``sampling_style`` attribute; these tests drive an rng-style EnvReplayBuffer
through each loop (reference behavior: rlkit/core/batch_rl_algorithm.py:
131-139, online_rl_algorithm.py, simple_offline_rl_algorithm.py:36-53)."""

import numpy as np

import jax

from s2p_tpu.core import BatchRLAlgorithm, OnlineRLAlgorithm, SimpleOfflineRlAlgorithm
from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
from s2p_tpu.data.replay import SimpleReplayBuffer, SlacReplayBuffer
from s2p_tpu.envs import StubEnv
from s2p_tpu.rl import CQLTrainer, CriticSLAC, IQLTrainer, TanhGaussianPolicy
from s2p_tpu.samplers import MdpPathCollector, MdpStepCollector, PolicyAgent
from s2p_tpu.utils.logging import Logger
import pytest

OBS, ACT = 4, 2


def _fill(buf, n=40, seed=0):
    rs = np.random.RandomState(seed)
    for _ in range(n):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    return buf


def _iql(seed=0):
    return IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT, seed=seed,
    )


def _logger(tmp_path):
    log = Logger()
    log.set_log_dir(str(tmp_path / "run"))
    log.set_print_tabular(False)
    return log


def test_sampling_style_attributes():
    assert SimpleReplayBuffer.sampling_style == "rng"
    assert EnvReplayBuffer.sampling_style == "rng"  # inherited
    assert SlacReplayBuffer.sampling_style == "key"


def test_env_buffer_through_batch_loop(tmp_path):
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = _iql()
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params,
                        deterministic=True)
    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent),
        evaluation_data_collector=MdpPathCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=3, start_epoch=-1, logger=_logger(tmp_path),
    )
    algo.train()
    assert tr._n_train_steps_total == 6  # epochs -1, 0 × 3 steps


def test_env_buffer_through_online_loop(tmp_path):
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = _iql()
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params)
    algo = OnlineRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpStepCollector(env, agent),
        evaluation_data_collector=MdpPathCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=2,
        num_trains_per_expl_step=1, logger=_logger(tmp_path),
    )
    algo.train()
    assert tr._n_train_steps_total == 2


def test_env_buffer_through_simple_offline_loop(tmp_path):
    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = _iql()
    SimpleOfflineRlAlgorithm(
        tr, buf, batch_size=8, num_epochs=1, num_batches_per_epoch=3,
        logger=_logger(tmp_path),
    ).train()
    assert tr._n_train_steps_total == 3


def test_scan_gate_rejects_memory_efficient_image_buffer(tmp_path):
    """scan_training must fall back to the per-step path when the buffer
    cannot provide a scannable device_state()."""
    buf = SimpleReplayBuffer(16, (8, 8, 9), ACT, image_buffer=True,
                             memory_efficient_way=True)
    assert not buf.scannable
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    tr = _iql()
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params)
    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent),
        evaluation_data_collector=MdpPathCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=1, start_epoch=-1,
        logger=_logger(tmp_path), scan_training=True,
    )
    assert not algo.scan_training


@pytest.mark.slow
def test_scanned_state_rl_cql():
    """CQL train_many over a SimpleReplayBuffer device_state() (reference
    state-RL path, cql_trainer.py:425-573, folded into one lax.scan)."""
    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = CQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT,
        num_random=3, policy_eval_start=0, seed=0,
    )
    metrics = tr.train_many(4, 8, buffer=buf)
    m = jax.device_get(metrics)
    assert np.isfinite(m["critic_loss"]) and np.isfinite(m["policy_loss"])
    assert tr._n_train_steps_total == 4

    # scanned result matches the per-step path driven with the same seed
    tr2 = CQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT,
        num_random=3, policy_eval_start=0, seed=0,
    )
    metrics2 = tr2.train_many(4, 8, buffer=buf)
    np.testing.assert_allclose(
        m["critic_loss"], float(jax.device_get(metrics2)["critic_loss"]),
        rtol=1e-6,
    )


@pytest.mark.slow
def test_scanned_state_rl_cql_through_batch_loop(tmp_path):
    """state-RL CQL with scan_training=True through the full loop — the
    exact combination that used to AssertionError (rl/cql.py train_many
    asserted the SLAC path)."""
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = CQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT,
        num_random=3, policy_eval_start=0, seed=0,
    )
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params)
    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent),
        evaluation_data_collector=MdpPathCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=3, start_epoch=-1,
        logger=_logger(tmp_path), scan_training=True,
    )
    assert algo.scan_training
    algo.train()
    assert tr._n_train_steps_total == 6


def test_eval_period_skips_and_carries_stats(tmp_path):
    """eval_period=3 collects eval paths only on epochs where
    epoch % 3 == 0 (plus the final epoch) and repeats the last measured
    eval stats on skipped epochs so the frozen csv key-set stays intact."""
    import csv as _csv
    import os.path as osp

    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = _iql()
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params,
                        deterministic=True)

    class CountingCollector(MdpPathCollector):
        calls = 0

        def collect_new_paths(self, *a, **kw):
            CountingCollector.calls += 1
            return super().collect_new_paths(*a, **kw)

    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent),
        evaluation_data_collector=CountingCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=1, start_epoch=-6,
        logger=_logger(tmp_path), eval_period=3,
    )
    algo.train()
    # epochs -6..0: eval at -6, -3, 0 (and 0 is also the final epoch)
    assert CountingCollector.calls == 3
    with open(osp.join(str(tmp_path / "run"), "progress.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 7
    returns = [r["eval/Average Returns"] for r in rows]
    assert all(v not in ("", None) for v in returns)
    # skipped epochs repeat the previous measured value
    assert returns[1] == returns[0] and returns[2] == returns[0]
    # collector path-length diagnostics backfill too (no blank columns)
    plen = [v for k in rows[0] if "path length" in k for v in
            (r[k] for r in rows)]
    assert plen and all(v not in ("", None) for v in plen)
    # carried-forward rows are marked stale
    fresh = [int(float(r["eval/is_fresh"])) for r in rows]
    assert fresh == [1, 0, 0, 1, 0, 0, 1]


def test_eval_period_first_epoch_always_evals(tmp_path):
    """Gating is relative to start_epoch: a resume-shifted start epoch that
    isn't a multiple of eval_period still evals on the FIRST epoch, so the
    frozen csv header includes the eval/ columns from dump 0."""
    import csv as _csv
    import os.path as osp

    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=5)
    buf = _fill(EnvReplayBuffer(200, env))
    tr = _iql()
    agent = PolicyAgent(tr.policy_module, tr.policy_state.params,
                        deterministic=True)
    algo = BatchRLAlgorithm(
        trainer=tr, exploration_env=env, evaluation_env=env,
        exploration_data_collector=MdpPathCollector(env, agent),
        evaluation_data_collector=MdpPathCollector(env, agent),
        replay_buffer=buf, batch_size=8, max_path_length=5, num_epochs=1,
        num_eval_steps_per_epoch=5, num_expl_steps_per_train_loop=1,
        num_trains_per_train_loop=1, start_epoch=-5,  # NOT % 3 == 0
        logger=_logger(tmp_path), eval_period=3,
    )
    algo.train()
    with open(osp.join(str(tmp_path / "run"), "progress.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 6
    # epochs -5..0: fresh at -5 (first), -2, 0 (final)
    fresh = [int(float(r["eval/is_fresh"])) for r in rows]
    assert fresh == [1, 0, 0, 1, 0, 1]
    assert all(r["eval/Average Returns"] not in ("", None) for r in rows)
