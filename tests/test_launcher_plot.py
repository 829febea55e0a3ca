"""Env factory/stacks, launcher, io, plotting utilities."""

import os.path as osp

import numpy as np
import pytest

from s2p_tpu.envs import StubEnv
from s2p_tpu.envs.stacks import FrameStack, StateStack, make
from s2p_tpu.utils.io import load_local_or_remote_file, save_pickle
from s2p_tpu.utils.launcher import run_experiment, run_experiment_here


def test_frame_stack_nhwc_channel_axis():
    env = StubEnv(action_dim=2, image_shape=(8, 8, 3), max_episode_steps=5)
    st = FrameStack(env, 3)
    o = st.reset()
    assert o.shape == (8, 8, 9)  # NHWC stack on last axis
    o2, r, done, info = st.step(env.action_space.sample())
    assert o2.shape == (8, 8, 9)
    # newest frame occupies the last 3 channels
    assert not np.array_equal(o2[..., :3], o2[..., 6:])


def test_state_stack_qpos_slice():
    env = StubEnv(obs_dim=17, action_dim=2, max_episode_steps=5)
    st = StateStack(env, 3, env_id="cheetah-run")
    o = st.reset()
    assert o.shape == (8 * 3,)  # cheetah qpos_idx=8
    o2, *_ = st.step(env.action_space.sample())
    assert o2.shape == (24,)


def test_make_factory_with_custom_class():
    env = make(
        env_class=StubEnv,
        env_kwargs=dict(obs_dim=4, action_dim=2),
        normalize_env=True,
    )
    o = env.reset()
    assert o.shape == (4,)
    env.step(np.zeros(2))
    assert env.action_space.low.min() == -1.0


def test_run_experiment_here_artifacts(tmp_path):
    calls = []

    def experiment(variant):
        calls.append(variant["seed"])
        return "done"

    out = run_experiment(
        experiment, {"a": 1}, exp_name="t", seed=3,
        base_log_dir=str(tmp_path),
    )
    assert out == "done" and calls == [3]
    run_dirs = list((tmp_path / "t").iterdir())
    assert len(run_dirs) == 1
    files = {p.name for p in run_dirs[0].iterdir()}
    assert {"variant.json", "experiment.pkl", "debug.log"} <= files
    exp = load_local_or_remote_file(str(run_dirs[0] / "experiment.pkl"))
    assert exp["seed"] == 3 and exp["variant"]["a"] == 1


def test_io_roundtrip(tmp_path):
    p = str(tmp_path / "x.pkl")
    save_pickle({"k": np.arange(3)}, p)
    back = load_local_or_remote_file(p)
    np.testing.assert_array_equal(back["k"], np.arange(3))
    npz = str(tmp_path / "y.npy")
    np.save(npz, np.ones(4))
    np.testing.assert_array_equal(load_local_or_remote_file(npz), np.ones(4))


def test_plotting(tmp_path):
    run = tmp_path / "exp" / "run_s0"
    run.mkdir(parents=True)
    (run / "progress.csv").write_text(
        "epoch,eval/Average Returns\n0,1.0\n1,2.0\n2,3.0\n"
    )
    (run / "variant.json").write_text('{"seed": 0}')
    from s2p_tpu.utils.plotting import load_exps, plot_returns, smooth

    exps = load_exps(str(tmp_path))
    assert len(exps) == 1
    np.testing.assert_allclose(
        exps[0].column("eval/Average Returns"), [1.0, 2.0, 3.0]
    )
    np.testing.assert_allclose(smooth(np.array([1.0, 2, 3]), 2), [1.5, 2.5])
    out = str(tmp_path / "plot.png")
    plot_returns(exps, save_path=out)
    assert osp.exists(out)
