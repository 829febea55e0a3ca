#!/usr/bin/env bash
# Multi-env GAN training on hardware (BASELINE.json config row 4:
# "multi-env GAN training (cheetah + walker) with multiscale
# discriminator, data-parallel across chips"). One process trains a
# single generator/discriminator on the concatenated cheetah+walker
# 100px datasets (states zero-padded to the widest env,
# s2p_tpu/data/pair_dataset.py::concat); on a multi-chip mesh the
# scanned path shards rows over the 'data' axis (train_many_dp — this
# box has one chip, so the DP leg is exercised by the multichip dryrun
# instead). Lazy-R1 on: the joint dataset is higher-variance than
# either env alone (see ROUND3_NOTES on D-dominance).
set -e
cd /root/repo
NITER=${1:-10}
PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
exec python -u train.py \
  --dataroot "runs/flagship/image_numpy_dataset_stack3_imgsize_100.hdf5,runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5" \
  --env_type multienv --netG s2p --batchSize 16 --bf16 --niter "$NITER" \
  --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 5 \
  --checkpoints_dir runs/flagship2/multienv_checkpoints \
  --log_dir runs/flagship2/multienv_gan_logs \
  --resume_dir runs/flagship2/multienv_gan_ckpt --eval_num 256
