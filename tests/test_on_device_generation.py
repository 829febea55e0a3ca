"""On-device GAN generation path of the RL entry (BASELINE.json config:
"S2P-augmented image-based offline RL ... with on-device generated
transitions")."""

import os.path as osp
import pickle

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from s2p_tpu.data.hdf5 import (
    make_slac_window_indices,
    make_synthetic_rl_dataset,
    save_dataset,
)

OBS, ACT, HW = 17, 6, 64


def test_finetune_with_gan_checkpoint(tmp_path):
    from s2p_tpu.cli.mujoco_finetune import experiment, build_parser, make_variant
    from s2p_tpu.gan import S2PGenerator
    import jax.numpy as jnp

    # real + augment fixtures
    real = make_synthetic_rl_dataset(n_episodes=2, episode_len=12,
                                     obs_dim=OBS, act_dim=ACT, img_hw=HW)
    real_path = str(tmp_path / "real.hdf5")
    save_dataset(real_path, real)
    n = len(real["timeouts"])
    obs_i, act_i = [], []
    for start in (0, 12):
        o, a = make_slac_window_indices(12, start, 8)
        obs_i.append(o)
        act_i.append(a)
    aug = dict(real, original_actions=real["actions"],
               original_rewards=real["rewards"],
               slac_observation_indices=np.concatenate(obs_i),
               slac_action_indices=np.concatenate(act_i),
               aleatoric_uncertainty=np.full((n, 1), 0.5, np.float32),
               disagreement_uncertainty=np.full((n, 1), 0.25, np.float32))
    aug.pop("image_observations_tp1")  # frames must come from the GAN
    aug_path = str(tmp_path / "aug.hdf5")
    save_dataset(aug_path, aug)

    # tiny GAN checkpoint
    gen = S2PGenerator(image_size=HW, ngf=8)
    params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS)),
                      jnp.zeros((1, HW, HW, 3)))
    ckpt = str(tmp_path / "g.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.device_get(params), f)

    args = build_parser().parse_args([
        "--env_name", "cheetah-run", "--exp_name", "ondev",
        "--algo_type", "iql", "--image_rl", "--slac_representation",
        "--data_path_real", real_path, "--data_path_gen", aug_path,
        "--gan_checkpoint", ckpt, "--gan_ngf", "8",
        "--uncertainty_type", "aleatoric", "--uncertainty_penalty_lambda", "2",
        "--image_size", str(HW), "--debug", "--no_video",
        "--log_dir", str(tmp_path / "logs"),
    ])
    log_dir = experiment(make_variant(args))
    assert osp.exists(osp.join(log_dir, "progress.csv"))
    with open(osp.join(log_dir, "debug.log")) as f:
        text = f.read()
    assert "synthesized" in text and "on device" in text
