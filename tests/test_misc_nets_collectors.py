"""Misc nets (spatial softmax, image/state switches), dict-obs envs,
goal-conditioned collectors, in-place sampler."""

import numpy as np

import jax
import jax.numpy as jnp

from s2p_tpu.envs import StubEnv
from s2p_tpu.envs.image_env import GymToMultiEnv, ImageEnv
from s2p_tpu.nn.misc_nets import (
    FeatPointMlp,
    ImageStatePolicy,
    PretrainedCNN,
    SpatialSoftmaxEncoder,
    spatial_softmax,
)
from s2p_tpu.samplers.agents import RandomAgent
from s2p_tpu.samplers.extra_collectors import (
    GoalConditionedPathCollector,
    InPlacePathSampler,
    ObsDictPathCollector,
)

import pytest


def test_spatial_softmax_localizes_peak():
    # a single hot pixel should produce keypoints at its coordinates
    f = np.full((1, 9, 9, 1), -10.0, np.float32)
    f[0, 2, 6, 0] = 10.0  # row 2 (y), col 6 (x)
    kp = np.asarray(spatial_softmax(jnp.asarray(f), temperature=0.1))
    x, y = kp[0, 0], kp[0, 1]
    np.testing.assert_allclose(x, np.linspace(-1, 1, 9)[6], atol=1e-3)
    np.testing.assert_allclose(y, np.linspace(-1, 1, 9)[2], atol=1e-3)


@pytest.mark.slow
def test_feat_point_mlp_autoencoder_shapes():
    model = FeatPointMlp(num_feat_points=8, input_channels=3, downsample_size=8)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 8, 8, 3)
    feat = model.apply(params, x, method=FeatPointMlp.encode)
    assert feat.shape == (2, 16)  # 8 keypoints × (x, y)


def test_image_state_switch():
    from s2p_tpu.nn.mlp import Mlp

    dim_img, dim_state = 12, 4
    pol = ImageStatePolicy(
        state_net=Mlp(hidden_sizes=(8,), output_size=2), image_dim=dim_img
    )
    x = jnp.ones((3, dim_img + dim_state))
    params = pol.init(jax.random.PRNGKey(0), x)
    out = pol.apply(params, x)
    assert out.shape == (3, 2)


def test_pretrained_cnn_frozen_features():
    feature_fn = lambda x: x.reshape(x.shape[0], -1) ** 2
    model = PretrainedCNN(feature_fn=feature_fn, hidden_sizes=(8,),
                          output_size=2, freeze_features=True)
    x = jnp.ones((2, 4, 4, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (2, 2)


def test_gym_to_multi_and_image_env():
    env = GymToMultiEnv(StubEnv(obs_dim=3, action_dim=2))
    o = env.reset()
    assert set(o) == {"observation", "state_observation"}
    o2, *_ = env.step(np.zeros(2))
    assert o2["observation"].shape == (3,)

    ienv = ImageEnv(StubEnv(obs_dim=3, action_dim=2), imsize=16)
    o = ienv.reset()
    assert o["image_observation"].shape == (16, 16, 3)
    assert o["image_observation"].dtype == np.float32
    assert o["image_observation"].max() <= 1.0
    assert "state_observation" in o


def test_obs_dict_and_goal_collectors():
    env = GymToMultiEnv(StubEnv(obs_dim=3, action_dim=2, max_episode_steps=4))
    col = ObsDictPathCollector(env, RandomAgent(env.action_space),
                               observation_key="observation")
    paths = col.collect_new_paths(4, 8, discard_incomplete_paths=False)
    assert sum(len(p["actions"]) for p in paths) >= 8
    assert col.get_snapshot()["observation_key"] == "observation"

    class _GoalEnv(GymToMultiEnv):
        def _wrap(self, obs):
            return dict(observation=obs, desired_goal=np.zeros(2, np.float32))

    genv = _GoalEnv(StubEnv(obs_dim=3, action_dim=2, max_episode_steps=4))

    class _DimCheckAgent(RandomAgent):
        def get_action(self, obs):
            assert obs.shape == (5,)  # obs 3 + goal 2
            return super().get_action(obs)

    gcol = GoalConditionedPathCollector(
        genv, _DimCheckAgent(genv.action_space)
    )
    gcol.collect_new_paths(4, 4, discard_incomplete_paths=False)


def test_in_place_sampler():
    env = StubEnv(obs_dim=3, action_dim=2, max_episode_steps=4)
    sampler = InPlacePathSampler(env, RandomAgent(env.action_space),
                                 max_path_length=4)
    paths, n = sampler.obtain_samples(max_samples=10)
    assert n >= 10 and len(paths) == 3
    paths, n = sampler.obtain_samples(max_samples=100, max_trajs=2)
    assert len(paths) == 2
