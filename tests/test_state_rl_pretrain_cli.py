"""State-RL branch of mujoco_finetune + slac_pretrain CLI (dm_control)."""

import os.path as osp

import numpy as np
import pytest

pytest.importorskip("dm_control")

from s2p_tpu.data.hdf5 import make_synthetic_rl_dataset, save_dataset


@pytest.mark.slow
def test_state_rl_experiment_smoke(tmp_path):
    from s2p_tpu.cli.mujoco_finetune import build_parser, experiment, make_variant

    ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=12, obs_dim=17,
                                   act_dim=6, img_hw=8)
    path = str(tmp_path / "state.hdf5")
    save_dataset(path, ds)
    args = build_parser().parse_args([
        "--env_name", "cheetah-run", "--exp_name", "state_iql",
        "--algo_type", "iql",
        "--data_path_real", path,
        "--debug", "--no_video", "--log_dir", str(tmp_path / "logs"),
    ])
    log_dir = experiment(make_variant(args))
    assert osp.exists(osp.join(log_dir, "progress.csv"))
    with open(osp.join(log_dir, "progress.csv")) as f:
        header = f.readline()
    assert "eval/Average Returns" in header


@pytest.mark.slow
def test_slac_pretrain_cli(tmp_path):
    import slac_pretrain

    ds = make_synthetic_rl_dataset(n_episodes=2, episode_len=10, obs_dim=5,
                                   act_dim=4, img_hw=64)
    path = str(tmp_path / "imgs.hdf5")
    save_dataset(path, ds)
    save_dir = slac_pretrain.main([
        "--dataset", path, "--num_steps", "2", "--batch_size", "2",
        "--save_every", "1", "--save_dir", str(tmp_path / "model"),
        "--num_sequences", "4", "--feature_dim", "16", "--z1_dim", "4",
        "--z2_dim", "8", "--log_every", "1",
    ])
    assert osp.exists(osp.join(save_dir, "latent.pkl"))
    assert osp.exists(osp.join(save_dir, "encoder.pkl"))
