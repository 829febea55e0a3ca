"""SAC trainer + online RL loop + step collector
(reference: rlkit/torch/sac/sac.py, core/online_rl_algorithm.py,
samplers/data_collector/step_collector.py)."""

import numpy as np

import jax

from s2p_tpu.core.online_rl_algorithm import OnlineRLAlgorithm
from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
from s2p_tpu.envs import StubEnv
from s2p_tpu.rl import CriticSLAC, TanhGaussianPolicy
from s2p_tpu.rl.sac import SACTrainer
from s2p_tpu.samplers import MdpPathCollector, PolicyAgent
from s2p_tpu.samplers.step_collector import MdpStepCollector
from s2p_tpu.utils.logging import Logger

OBS, ACT = 4, 2


def _batch(seed=0, B=16):
    rs = np.random.RandomState(seed)
    return dict(
        observations=rs.randn(B, OBS).astype(np.float32),
        next_observations=rs.randn(B, OBS).astype(np.float32),
        actions=np.tanh(rs.randn(B, ACT)).astype(np.float32),
        rewards=rs.rand(B, 1).astype(np.float32),
        terminals=np.zeros((B, 1), np.float32),
    )


def test_sac_trainer_losses_and_alpha():
    tr = SACTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(32,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(32,)),
        obs_dim=OBS, action_dim=ACT,
    )
    batch = _batch()
    a0 = float(tr.log_alpha)
    first = None
    for _ in range(20):
        m = tr.train(batch)
        if first is None:
            first = jax.device_get(m)
    last = jax.device_get(m)
    assert np.isfinite(last["critic_loss"]) and np.isfinite(last["policy_loss"])
    assert last["qf1_loss"] < first["qf1_loss"]
    assert float(tr.log_alpha) != a0
    snap = tr.get_snapshot()
    assert "log_alpha" in snap


def test_step_collector_paths_and_steps():
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=4)
    from s2p_tpu.samplers.agents import RandomAgent

    col = MdpStepCollector(env, RandomAgent(env.action_space))
    steps = col.collect_new_steps(4, 10, discard_incomplete_paths=False)
    assert len(steps) == 10
    # reference semantics: lifetime step totals count KEPT paths only —
    # 2 complete 4-step paths are in; the 2 in-progress steps are not
    assert col.get_diagnostics()["num steps total"] == 8
    assert len(col.get_epoch_paths()) == 2
    assert all(len(p["actions"]) == 4 for p in col.get_epoch_paths())


def test_step_collector_discard_keeps_capped_paths():
    """Reference _handle_rollout_ending semantics: a path that finished by
    hitting max_path_length has path_len == max_path_length and is KEPT
    even under discard_incomplete_paths (only shorter non-terminal paths
    would be dropped — unreachable from collect_one_step, as in the
    reference). Lifetime totals count kept paths only."""
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=10)
    from s2p_tpu.samplers.agents import RandomAgent

    # max_path_length=3 < the env's 10-step limit → paths finish via the
    # length cap with done=False
    col = MdpStepCollector(env, RandomAgent(env.action_space))
    col.collect_new_steps(3, 7, discard_incomplete_paths=True)
    assert len(col.get_epoch_paths()) == 2
    assert col.get_diagnostics()["num steps total"] == 6
    # the unreachable-from-collect branch still implements the reference
    # contract: a short non-terminal partial fed to _finish_path is dropped
    col._partial = {k: [v] for k, v in zip(
        ("observations", "actions", "rewards", "next_observations",
         "terminals", "dones", "agent_infos", "env_infos"),
        (np.zeros(OBS), np.zeros(ACT), 0.0, np.zeros(OBS), False, False,
         {}, {}),
    )}
    col._finish_path(3, discard_incomplete_paths=True)
    assert len(col.get_epoch_paths()) == 2  # unchanged
    assert col.get_diagnostics()["num steps total"] == 6


def test_online_rl_loop_end_to_end(tmp_path):
    env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=4)
    eval_env = StubEnv(obs_dim=OBS, action_dim=ACT, max_episode_steps=4)
    policy = TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT)
    trainer = SACTrainer(
        policy=policy, critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, action_dim=ACT,
    )
    expl_agent = PolicyAgent(policy, trainer.policy_state.params)
    eval_agent = PolicyAgent(policy, trainer.policy_state.params,
                             deterministic=True)
    buf = EnvReplayBuffer(1000, env)
    log = Logger()
    log.set_log_dir(str(tmp_path / "run"))
    log.set_print_tabular(False)
    algo = OnlineRLAlgorithm(
        trainer=trainer,
        exploration_env=env, evaluation_env=eval_env,
        exploration_data_collector=MdpStepCollector(env, expl_agent),
        evaluation_data_collector=MdpPathCollector(eval_env, eval_agent),
        replay_buffer=buf,
        batch_size=8, max_path_length=4, num_epochs=2,
        num_eval_steps_per_epoch=4, num_expl_steps_per_train_loop=6,
        num_trains_per_expl_step=1, min_num_steps_before_training=8,
        logger=log, snapshot_gap=1,
    )
    algo.train()
    assert len(buf) == 8 + 2 * 6  # seed steps + 2 epochs × 6 expl steps
    assert trainer._n_train_steps_total == 2 * 6
    import os.path as osp

    assert osp.exists(osp.join(str(tmp_path / "run"), "progress.csv"))
