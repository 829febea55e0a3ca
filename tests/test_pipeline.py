"""Full S2P data-generation pipeline: real HDF5 → world-model augment →
GAN image generation → SLAC buffer ingestion (SURVEY §1 end-to-end flow)."""

import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from s2p_tpu.data.hdf5 import (
    load_augment_dataset,
    make_synthetic_rl_dataset,
    save_dataset,
)

OBS, ACT, HW = 17, 6, 64


def test_full_generation_pipeline(tmp_path):
    # 1) real dataset
    real = make_synthetic_rl_dataset(
        n_episodes=2, episode_len=12, obs_dim=OBS, act_dim=ACT, img_hw=HW
    )
    real_path = str(tmp_path / "real.hdf5")
    save_dataset(real_path, real)

    # 2) world-model augment rollout (trains a tiny ensemble)
    from s2p_tpu.cli import train_gan  # noqa: F401 (import check)
    import state_transition_rollout as strollout

    aug_path = str(tmp_path / "aug.hdf5")
    strollout.main([
        "--dataset", real_path, "--output", aug_path,
        "--train_steps", "30", "--hidden_features", "16",
        "--num_sequences", "4",
    ])
    aug = load_augment_dataset(aug_path)
    assert "disagreement_uncertainty" in aug
    # synthetic next-state transitions differ from the real rows
    assert (aug["next_observations"] != real["next_observations"]).any()

    # 3) train a tiny GAN and render generated tp1 frames into the dataset
    from s2p_tpu.cli.train_gan import main as gan_train

    gan_train([
        "--dataroot", real_path, "--batchSize", "8", "--niter", "1",
        "--max_steps", "1", "--ngf", "8", "--ndf", "8", "--num_D", "1",
        "--n_layers_D", "2", "--no_vgg_loss",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--log_dir", str(tmp_path / "logs"),
    ])
    from s2p_tpu.cli.generate_images import main as gen_images

    rl_path = str(tmp_path / "aug-rl.hdf5")
    gen_images([
        "--dataset", aug_path,
        "--checkpoint", str(tmp_path / "ckpt" / "cheetah_1.pkl"),
        "--output", rl_path, "--ngf", "8", "--batch_size", "8",
    ])
    rl = load_augment_dataset(rl_path)
    assert rl["image_observations_tp1"].shape == (24, HW, HW, 3)
    assert rl["image_observations_tp1"].dtype == np.uint8

    # 4) the offline RL consumer ingests it with the penalty rule
    from s2p_tpu.slac import SlacAlgorithm

    slac = SlacAlgorithm(
        action_dim=ACT, num_sequences=4, buffer_size=200, batch_size_latent=2,
        feature_dim=16, z1_dim=4, z2_dim=8, hidden_units=(16, 16),
        image_size=HW, seed=0,
    )
    n_real = slac.load_data_in_buffer(real_path)
    n_gen = slac.load_data_in_buffer(
        rl_path, generated_for_slac=True,
        data_mix_type="all_state_1step_random_action",
        uncertainty_type="disagreement", uncertainty_penalty_lambda=2.0,
    )
    assert n_real > 0 and n_gen > 0
    batch = slac.buffer.random_batch(jax.random.PRNGKey(0), 4)
    assert batch["observations"].shape == (4, 5, HW, HW, 3)
