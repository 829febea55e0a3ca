"""Crash-recovery resume for the RL loop (--resume_dir).

The reference has no recovery story (SURVEY §5.3); the TPU build adds
full-state orbax checkpoints — params, optimizer states, entropy
temperatures, SLAC latent/opt, rng, step counters — saved per epoch and
restored by s2p_tpu.cli.mujoco_finetune._setup_resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
from s2p_tpu.envs import StubEnv
from s2p_tpu.rl import CQLTrainer, CriticSLAC, IQLTrainer, TanhGaussianPolicy

OBS, ACT = 4, 2


def _buf(env, n=60, seed=0):
    rs = np.random.RandomState(seed)
    buf = EnvReplayBuffer(200, env)
    for _ in range(n):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    return buf


def _mk(cls, seed=0):
    kw = dict(policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
              critic=CriticSLAC(hidden_sizes=(16,)),
              obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT, seed=seed)
    return cls(**kw)


@pytest.mark.parametrize("cls", [IQLTrainer, CQLTrainer])
def test_full_state_roundtrip_through_orbax(cls, tmp_path):
    from s2p_tpu.utils.checkpoint import CheckpointManager

    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = _buf(env)
    rs = np.random.RandomState(1)
    tr = _mk(cls)
    for _ in range(5):
        tr.train(buf.random_batch(8, rng=rs))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(tr._n_train_steps_total, jax.device_get(tr.full_state()))
    mgr.wait_until_finished()

    fresh = _mk(cls, seed=7)
    assert fresh._n_train_steps_total == 0
    fresh.load_full_state(mgr.restore(fresh.full_state()))
    mgr.close()

    assert fresh._n_train_steps_total == 5
    for a, b in zip(jax.tree_util.tree_leaves(tr.policy_state.params),
                    jax.tree_util.tree_leaves(fresh.policy_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (second moments non-zero after training)
    m2 = jax.tree_util.tree_leaves(fresh.policy_state.opt_state)
    assert any(float(jnp.abs(x).max()) > 0 for x in m2 if hasattr(x, "max"))
    # training continues from the restored state without error
    fresh.train(buf.random_batch(8, rng=rs))
    assert fresh._n_train_steps_total == 6


def test_setup_resume_advances_start_epoch(tmp_path):
    from s2p_tpu.cli.mujoco_finetune import _setup_resume

    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = _buf(env)
    rs = np.random.RandomState(1)
    tr = _mk(IQLTrainer)
    variant = {"resume_dir": str(tmp_path / "ck"),
               "num_trains_per_train_loop": 2}
    mgr, start, hook = _setup_resume(variant, tr, -6)
    assert start == -6 and hook is not None  # nothing to restore yet
    for _ in range(4):  # two epochs' worth
        tr.train(buf.random_batch(8, rng=rs))
    hook(None, -5)
    mgr.wait_until_finished()
    mgr.close()

    fresh = _mk(IQLTrainer, seed=9)
    mgr2, start2, hook2 = _setup_resume(variant, fresh, -6)
    mgr2.close()
    assert start2 == -4  # 4 steps / 2 per loop = 2 epochs done
    assert fresh._n_train_steps_total == 4
