"""Seeded-run csv regression — the reference's primary validation pattern
(SURVEY §4): identical seeds must reproduce progress.csv exactly."""

import numpy as np

from s2p_tpu.core.simple_offline_rl_algorithm import SimpleOfflineRlAlgorithm
from s2p_tpu.data.env_replay_buffer import EnvReplayBuffer
from s2p_tpu.envs import StubEnv
from s2p_tpu.rl import CriticSLAC, IQLTrainer, TanhGaussianPolicy
from s2p_tpu.testing import check_equal, get_exp
from s2p_tpu.utils.logging import Logger
from s2p_tpu.utils.seeding import set_seed
import pytest


def _run(tmp_path, name: str, seed: int) -> str:
    set_seed(seed)
    OBS, ACT = 4, 2
    env = StubEnv(obs_dim=OBS, action_dim=ACT)
    buf = EnvReplayBuffer(200, env)
    rs = np.random.RandomState(seed)
    for _ in range(60):
        buf.add_sample(rs.randn(OBS), np.tanh(rs.randn(ACT)), rs.rand(), 0.0,
                       rs.randn(OBS))
    trainer = IQLTrainer(
        policy=TanhGaussianPolicy(hidden_sizes=(16,), action_dim=ACT),
        critic=CriticSLAC(hidden_sizes=(16,)),
        obs_dim=OBS, policy_input_dim=OBS, action_dim=ACT, seed=seed,
    )
    log = Logger()
    run_dir = str(tmp_path / name)
    log.set_log_dir(run_dir)
    log.set_print_tabular(False)
    SimpleOfflineRlAlgorithm(
        trainer, buf, batch_size=8, num_epochs=2, num_batches_per_epoch=5,
        logger=log, seed=seed,
    ).train()
    log.close()
    return run_dir


@pytest.mark.slow
def test_same_seed_reproduces_csv(tmp_path):
    a = _run(tmp_path, "a", seed=7)
    b = _run(tmp_path, "b", seed=7)
    ra, rb = get_exp(a + "/progress.csv"), get_exp(b + "/progress.csv")
    keys = [k for k in ra[0] if not k.startswith("time/")]
    check_equal(ra, rb, keys, rel_tol=1e-6)


@pytest.mark.slow
def test_different_seed_diverges(tmp_path):
    a = _run(tmp_path, "a", seed=7)
    c = _run(tmp_path, "c", seed=8)
    ra, rc = get_exp(a + "/progress.csv"), get_exp(c + "/progress.csv")
    diffs = [
        k for k in ra[0]
        if not k.startswith("time/") and ra[-1][k] != rc[-1][k]
    ]
    assert diffs, "different seeds should produce different training traces"
