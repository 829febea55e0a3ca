"""image_render + collect_dataset pipeline scripts (dm_control-gated)."""

import numpy as np
import pytest

pytest.importorskip("dm_control")


@pytest.fixture(scope="module")
def _gl_ok():
    from s2p_tpu.envs import make_dmc

    try:
        make_dmc("cheetah-run", from_pixels=False).render(height=8, width=8)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"rendering unavailable: {e}")


@pytest.mark.slow
def test_collect_then_render_roundtrip(tmp_path, _gl_ok):
    import collect_dataset
    import image_render
    import h5py

    state_path = str(tmp_path / "state.hdf5")
    collect_dataset.main([
        "--env_name", "cheetah-run", "--num_steps", "30",
        "--start_random_steps", "25", "--batch_size", "8",
        "--output", state_path, "--log_interval", "0",
    ])
    with h5py.File(state_path) as f:
        assert f["observations"].shape == (30, 17)
        assert f["qpos_qvel"].shape[1] == 18  # cheetah nq=9 + nv=9

    img_path = str(tmp_path / "imgs.hdf5")
    image_render.main([
        "--dataset", state_path, "--env_name", "cheetah-run",
        "--imsize", "32", "--output", img_path,
    ])
    with h5py.File(img_path) as f:
        assert f["image_observations"].shape == (30, 32, 32, 3)
        assert f["image_observations"].dtype == np.uint8
        im = f["image_observations"][:]
        tp1 = f["image_observations_tp1"][:]
        tm1 = f["image_observations_tm1"][:]
    # tp1 of row t equals the frame of row t+1 (within the episode)
    np.testing.assert_array_equal(tp1[0], im[1])
    np.testing.assert_array_equal(tm1[1], im[0])
    np.testing.assert_array_equal(tm1[0], im[0])  # episode start repeats
    # frames vary over the trajectory (the cheetah actually moves)
    assert (im[0] != im[20]).any()


def test_add_frame_stacks_episode_boundaries():
    from image_render import add_frame_stacks

    frames = np.arange(6, dtype=np.uint8).reshape(6, 1, 1, 1) * np.ones(
        (6, 2, 2, 3), np.uint8
    )
    timeouts = np.array([0, 0, 1, 0, 0, 1], np.float32)
    out = add_frame_stacks(frames, timeouts)
    # second episode's tm1 must not cross into the first episode
    np.testing.assert_array_equal(out["image_observations_tm1"][3],
                                  frames[3])
    np.testing.assert_array_equal(out["image_observations_tm1"][4],
                                  frames[3])
    np.testing.assert_array_equal(out["image_observations_tp1"][2],
                                  frames[2])  # episode end repeats itself
    np.testing.assert_array_equal(out["image_observations_tp1"][3],
                                  frames[4])
