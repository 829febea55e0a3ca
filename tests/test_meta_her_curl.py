"""CURL encoders, HER buffer, multitask envs/buffers, meta loop."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.data.her_buffer import ObsDictRelabelingBuffer
from s2p_tpu.data.multitask_buffer import (
    MetaRLAlgorithm,
    MultiTaskReplayBuffer,
    SplitReplayBuffer,
)
from s2p_tpu.data.replay import SimpleReplayBuffer
from s2p_tpu.envs import StubEnv
from s2p_tpu.envs.multitask import PointRobotEnv
from s2p_tpu.rl.encoders import (
    CURL,
    EncoderCritic,
    PixelEncoder,
    TanhGaussianPolicyWithEncoder,
    curl_loss,
)


@pytest.mark.slow
def test_pixel_encoder_and_critic():
    enc = PixelEncoder(feature_dim=16, num_layers=2, num_filters=8)
    critic = EncoderCritic(enc, hidden_sizes=(16,))
    obs = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 9))
    act = jnp.zeros((2, 3))
    params = critic.init(jax.random.PRNGKey(0), obs, act)
    q1, q2 = critic.apply(params, obs, act)
    assert q1.shape == (2, 1)
    # detached encoder blocks gradient flow into conv weights
    def loss(p, detach):
        a, b = critic.apply(p, obs, act, detach_encoder=detach)
        return jnp.sum(a + b)

    # shared encoder instance is hoisted to one top-level subtree — the
    # reference's encoder weight-sharing assert (iql_trainer.py:353-355)
    # holds by construction
    assert "encoder" in params["params"]
    g_free = jax.grad(loss)(params, False)
    g_det = jax.grad(loss)(params, True)
    conv_free = g_free["params"]["encoder"]["conv0"]["kernel"]
    conv_det = g_det["params"]["encoder"]["conv0"]["kernel"]
    assert float(jnp.abs(conv_free).sum()) > 0
    assert float(jnp.abs(conv_det).sum()) == 0


@pytest.mark.slow
def test_policy_with_encoder():
    enc = PixelEncoder(feature_dim=16, num_layers=2, num_filters=8)
    pol = TanhGaussianPolicyWithEncoder(enc, action_dim=3, hidden_sizes=(16,))
    obs = jnp.zeros((2, 32, 32, 9))
    params = pol.init(jax.random.PRNGKey(0), obs)
    dist = pol.apply(params, obs)
    a = dist.sample(jax.random.PRNGKey(1))
    assert a.shape == (2, 3)


@pytest.mark.slow
def test_curl_logits_and_loss():
    enc = PixelEncoder(feature_dim=16, num_layers=2, num_filters=8)
    curl = CURL(enc)
    obs = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 9))
    params = curl.init(jax.random.PRNGKey(1), obs, obs)
    logits = curl.apply(params, obs, obs)
    assert logits.shape == (4, 4)
    assert float(jnp.max(logits)) <= 0.0  # row-max subtracted
    loss = curl_loss(logits)
    assert np.isfinite(float(loss))
    # with W = I, identical anchor/positive pairs make the diagonal the
    # similarity maximum → loss below the uniform-logits baseline
    d = params["params"]["W"].shape[0]
    params_id = {"params": {**params["params"], "W": jnp.eye(d)}}
    loss_id = curl_loss(curl.apply(params_id, obs, obs))
    assert float(loss_id) < float(curl_loss(jnp.zeros((4, 4))))


class _GoalEnv:
    def compute_rewards(self, achieved, goals):
        return -(np.linalg.norm(achieved - goals, axis=1) > 0.1).astype(np.float32)


def _goal_path(T=5, seed=0):
    rs = np.random.RandomState(seed)
    obs = [dict(observation=rs.randn(3).astype(np.float32),
                desired_goal=np.zeros(2, np.float32),
                achieved_goal=rs.randn(2).astype(np.float32))
           for _ in range(T + 1)]
    return dict(
        observations=obs[:-1],
        next_observations=obs[1:],
        actions=rs.randn(T, 2).astype(np.float32),
        terminals=np.zeros(T, np.float32),
    )


def test_her_buffer_relabels_goals():
    buf = ObsDictRelabelingBuffer(
        100, _GoalEnv(), fraction_goals_rollout_goals=0.0,
    )
    for i in range(3):
        buf.add_path(_goal_path(seed=i))
    assert len(buf) == 15
    batch = buf.random_batch(32, np.random.RandomState(0))
    assert batch["observations"].shape == (32, 5)  # obs 3 + goal 2
    assert batch["rewards"].shape == (32, 1)
    # with 100% future relabeling some rewards should be 'reached'
    # occasionally when future==current; rewards in {0, -1}
    assert set(np.unique(batch["rewards"])) <= {0.0, -1.0}


def test_multitask_buffer_and_split():
    env = StubEnv(obs_dim=3, action_dim=2)
    mtb = MultiTaskReplayBuffer(100, env, task_indices=[0, 1])
    rs = np.random.RandomState(0)
    for t in (0, 1):
        for _ in range(10):
            mtb.add_sample(t, rs.randn(3), rs.randn(2), t * 1.0, 0.0, rs.randn(3))
    b = mtb.sample_tasks_batch([0, 1], 4, rs)
    assert b["observations"].shape == (2, 4, 3)
    np.testing.assert_allclose(b["rewards"][0], 0.0)
    np.testing.assert_allclose(b["rewards"][1], 1.0)

    split = SplitReplayBuffer(
        SimpleReplayBuffer(50, 3, 2), SimpleReplayBuffer(50, 3, 2),
        fraction_paths_in_train=0.5,
    )
    path = dict(observations=rs.randn(5, 3), actions=rs.randn(5, 2),
                rewards=rs.rand(5), terminals=np.zeros(5),
                next_observations=rs.randn(5, 3))
    for _ in range(10):
        split.add_path(path)
    assert len(split.train_replay_buffer) > 0
    assert len(split.validation_replay_buffer) > 0


def test_point_robot_and_meta_loop():
    env = PointRobotEnv(num_tasks=4, max_episode_steps=5)
    env.reset_task(0)
    o, r, d, info = env.step(np.array([0.1, 0.0]))
    assert o.shape == (2,) and r <= 0

    calls = []

    class _Trainer:
        def train(self, batch):
            calls.append(batch["observations"].shape)

        def end_epoch(self, epoch):
            pass

    mtb = MultiTaskReplayBuffer(100, env, env.get_all_task_idx())

    def collect(task):
        rs = np.random.RandomState(task)
        return [dict(observations=rs.randn(5, 2), actions=rs.randn(5, 2),
                     rewards=rs.rand(5), terminals=np.zeros(5),
                     next_observations=rs.randn(5, 2))]

    algo = MetaRLAlgorithm(
        env, _Trainer(), mtb, collect, env.get_all_task_idx(),
        num_iterations=2, num_tasks_per_itr=4, num_train_steps_per_itr=3,
        meta_batch=2, batch_size=4,
    )
    algo.train()
    assert len(calls) == 6
    assert calls[0] == (2, 4, 2)


@pytest.mark.skipif(
    not pytest.importorskip("dm_control", reason="dm_control missing"),
    reason="dm_control missing",
)
def test_velocity_direction_task_envs():
    from s2p_tpu.envs import make_dmc
    from s2p_tpu.envs.multitask import DirectionTaskEnv, VelocityTaskEnv

    base = make_dmc("cheetah-run", from_pixels=False, seed=0)
    env = VelocityTaskEnv(base, num_tasks=3)
    assert env.get_all_task_idx() == [0, 1, 2]
    env.reset_task(1)
    o, r, d, info = env.step(env.action_space.sample())
    assert "velocity" in info and np.isfinite(r)
    tasks = env.sample_tasks(5, seed=1)
    assert len(tasks) == 5

    denv = DirectionTaskEnv(make_dmc("cheetah-run", from_pixels=False, seed=0))
    denv.reset_task(0)
    _, r_neg, _, _ = denv.step(np.ones(6) * 0.5)
    assert np.isfinite(r_neg)
