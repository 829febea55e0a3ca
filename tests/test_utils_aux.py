"""Aux utilities: RAD augmentations, exploration strategies, sweepers,
schedules, env replay buffer, normalizer, testing toolkit."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2p_tpu.data.env_replay_buffer import (
    EnvReplayBuffer,
    FixedNormalizer,
    Normalizer,
    PathBuilder,
)
from s2p_tpu.envs import StubEnv
from s2p_tpu.nn.augmentations import (
    AUGMENTATIONS,
    grayscale,
    random_convolution,
    random_crop,
    random_cutout,
    random_flip,
    random_rotation,
    random_translate,
)
from s2p_tpu.testing import check_equal, get_exp
from s2p_tpu.testing.stubs import StubPolicy, is_binomial_trial_likely
from s2p_tpu.utils.exploration import (
    EpsilonGreedy,
    GaussianStrategy,
    OUStrategy,
    PolicyWrappedWithExplorationStrategy,
)
from s2p_tpu.utils.sweep import (
    ConstantSchedule,
    DeterministicHyperparameterSweeper,
    LinearSchedule,
    LogFloatParam,
    PiecewiseLinearSchedule,
    RandomHyperparameterSweeper,
)


def _imgs(n=4, hw=32):
    return np.random.RandomState(0).randint(0, 255, (n, hw, hw, 3), np.uint8)


def test_random_crop_and_translate_shapes():
    imgs = jnp.asarray(_imgs(hw=32))
    out = random_crop(jax.random.PRNGKey(0), imgs, 24)
    assert out.shape == (4, 24, 24, 3)
    big = random_translate(jax.random.PRNGKey(1), imgs, 40)
    assert big.shape == (4, 40, 40, 3)
    # translate preserves total mass (pixels only move)
    np.testing.assert_array_equal(
        np.asarray(big).astype(np.int64).sum(), np.asarray(imgs).astype(np.int64).sum()
    )


def test_grayscale_channels_equal():
    g = grayscale(jnp.asarray(_imgs()))
    g = np.asarray(g)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])


def test_cutout_zeroes_a_box():
    imgs = jnp.ones((2, 32, 32, 3), jnp.uint8) * 200
    out = np.asarray(random_cutout(jax.random.PRNGKey(0), imgs, 5, 10))
    assert (out == 0).any() and (out == 200).any()


def test_flip_and_rotation_probabilities():
    imgs = jnp.asarray(_imgs(n=200, hw=8))
    flipped = np.asarray(random_flip(jax.random.PRNGKey(0), imgs, p=0.5))
    n_changed = sum(
        not np.array_equal(flipped[i], np.asarray(imgs[i])) for i in range(200)
    )
    assert is_binomial_trial_likely(200, 0.5, n_changed, z=4)
    rotated = np.asarray(random_rotation(jax.random.PRNGKey(1), imgs, p=1.0))
    assert not np.array_equal(rotated, np.asarray(imgs))


def test_random_convolution_runs():
    out = random_convolution(jax.random.PRNGKey(0), jnp.asarray(_imgs()))
    assert out.shape == (4, 32, 32, 3) and out.dtype == jnp.uint8


def test_augmentation_registry():
    assert set(AUGMENTATIONS) >= {
        "crop", "translate", "grayscale", "cutout", "cutout_color",
        "flip", "rotation", "convolution", "color_jitter", "no_aug",
    }


def test_exploration_strategies():
    env = StubEnv(obs_dim=3, action_dim=2)
    pol = StubPolicy(np.zeros(2))
    eg = EpsilonGreedy(env.action_space, prob_random_action=1.0)
    a, _ = eg.get_action(0, np.zeros(3), pol)
    assert env.action_space.contains(a)

    gs = GaussianStrategy(env.action_space, max_sigma=0.1, min_sigma=0.1)
    a, _ = gs.get_action(0, np.zeros(3), pol)
    assert a.shape == (2,) and (a != 0).any()
    assert (np.abs(a) <= 1.0).all()

    ou = OUStrategy(env.action_space, max_sigma=0.1)
    a1 = ou.get_action_from_raw_action(np.zeros(2))
    a2 = ou.get_action_from_raw_action(np.zeros(2))
    assert not np.array_equal(a1, a2)  # temporally-correlated noise evolves

    wrapped = PolicyWrappedWithExplorationStrategy(gs, pol)
    a, _ = wrapped.get_action(np.zeros(3))
    assert wrapped.t == 1
    wrapped.reset()
    assert wrapped.t == 0


def test_sweepers():
    grid = DeterministicHyperparameterSweeper(
        {"trainer_kwargs.lr": [1e-3, 1e-4], "seed": [0, 1, 2]},
        default_parameters={"trainer_kwargs": {"discount": 0.99}},
    )
    variants = grid.iterate_hyperparameters()
    assert len(variants) == 6
    assert variants[0].trainer_kwargs.discount == 0.99
    assert {v.seed for v in variants} == {0, 1, 2}

    rand = RandomHyperparameterSweeper(
        [LogFloatParam("lr", 1e-5, 1e-2)], default_kwargs={"seed": 0}
    )
    vs = list(rand.iterate_hyperparameters(5))
    assert len(vs) == 5
    assert all(1e-5 <= v.lr <= 1e-2 for v in vs)


def test_schedules():
    assert ConstantSchedule(3.0).get_value(100) == 3.0
    lin = LinearSchedule(0.0, 10.0, ramp_duration=10)
    assert lin.get_value(0) == 0.0
    assert lin.get_value(5) == 5.0
    assert lin.get_value(100) == 10.0
    pw = PiecewiseLinearSchedule([0, 10, 20], [1.0, 0.5, 0.0])
    assert pw.get_value(15) == pytest.approx(0.25)


def test_env_replay_buffer_and_normalizer():
    env = StubEnv(obs_dim=3, action_dim=2)
    buf = EnvReplayBuffer(100, env)
    for _ in range(10):
        buf.add_sample(np.zeros(3), np.zeros(2), 1.0, 0.0, np.ones(3))
    batch = buf.random_batch(4)
    assert batch["observations"].shape == (4, 3)

    norm = Normalizer(2)
    data = np.random.RandomState(0).randn(100, 2) * 5 + 3
    norm.update(data)
    z = norm.normalize(data)
    assert abs(z.mean()) < 0.1 and abs(z.std() - 1) < 0.1
    np.testing.assert_allclose(norm.denormalize(z), data, rtol=1e-4)

    fx = FixedNormalizer(2)
    fx.set_mean([1.0, 2.0])
    fx.set_std([2.0, 4.0])
    np.testing.assert_allclose(fx.normalize(np.array([3.0, 10.0])), [1.0, 2.0])


def test_path_builder():
    pb = PathBuilder()
    for i in range(3):
        pb.add_all(observations=np.full(2, i), rewards=float(i),
                   env_infos={"k": i})
    stacked = pb.get_all_stacked()
    assert stacked["observations"].shape == (3, 2)
    assert isinstance(stacked["env_infos"], list)
    assert len(pb) == 3


def test_csv_regression_helpers(tmp_path):
    p1 = tmp_path / "a.csv"
    p2 = tmp_path / "b.csv"
    p1.write_text("epoch,loss\n0,1.0\n1,0.5\n")
    p2.write_text("epoch,loss\n0,1.0000001\n1,0.5\n")
    a, b = get_exp(str(p1)), get_exp(str(p2))
    check_equal(a, b, ["epoch", "loss"], rel_tol=1e-5)
    p3 = tmp_path / "c.csv"
    p3.write_text("epoch,loss\n0,2.0\n1,0.5\n")
    with pytest.raises(AssertionError):
        check_equal(a, get_exp(str(p3)), ["loss"])


def test_tensor_trace(tmp_path):
    from s2p_tpu.testing import TensorTrace

    t1 = TensorTrace(str(tmp_path / "a"))
    t2 = TensorTrace(str(tmp_path / "b"))
    for i in range(3):
        x = np.full((2, 2), i, np.float32)
        t1.save(x)
        t2.save(jnp.asarray(x))
    t1.compare(t2)
