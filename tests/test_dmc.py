"""Real dm_control env factory tests (reference: rlkit/torch/slac/env.py:7-17,
make_env registry). Skipped when dm_control or EGL is unavailable."""

import numpy as np
import pytest

pytest.importorskip("dm_control")


@pytest.fixture(scope="module")
def cheetah():
    from s2p_tpu.envs import make_dmc

    try:
        env = make_dmc("cheetah-run", from_pixels=False, seed=0)
        env.render(height=8, width=8)  # probe GL
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"dm_control rendering unavailable: {e}")
    return env


def test_cheetah_state_api(cheetah):
    o = cheetah.reset()
    assert o.shape == (17,)  # cheetah-run flat observation
    assert cheetah.action_space.shape == (6,)
    assert cheetah._max_episode_steps == 250  # 1000 / frame_skip 4
    assert cheetah.action_repeat == 4
    o2, r, done, info = cheetah.step(cheetah.action_space.sample())
    assert o2.shape == (17,) and np.isfinite(r) and not done
    assert "TimeLimit.truncated" in info


def test_cheetah_pixels_and_set_state(cheetah):
    from s2p_tpu.envs import make_dmc

    env = make_dmc("cheetah-run", from_pixels=True, height=64, width=64, seed=0)
    o = env.reset()
    assert o.shape == (64, 64, 3) and o.dtype == np.uint8
    # state→render replay (the GAN data-generation hook)
    qpos = env.physics.data.qpos.copy()
    qvel = env.physics.data.qvel.copy()
    img_a = env.render(height=32, width=32)
    env.step(env.action_space.sample())
    env.set_state(qpos, qvel)
    img_b = env.render(height=32, width=32)
    np.testing.assert_array_equal(img_a, img_b)
