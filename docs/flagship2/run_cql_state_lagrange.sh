#!/usr/bin/env bash
# CQL-Lagrange A/B at protocol scale: identical to the
# round-3 state-CQL entropy run except --with_lagrange --lagrange_thresh
# 10 (reference: rlkit cql_trainer.py:387-395 optional Lagrange alpha').
# Purpose: demonstrate the dual variable containing the monotone dataset-Q
# drift that the fixed min_q_weight=5 penalty produces (q1_pred +71 ->
# -65 in the non-Lagrange run; the image run drifted to -195 and its
# policy collapsed in the last 20 epochs).
set -e
cd /root/repo
# CHIP JOB (~75 min): on one CPU core this is ~290 s/epoch = 12 h.
# The baseline cql_state run executed on the chip (see pipeline
# script note), so the A/B must too for comparable timings.
exec env PYTHONPATH=/root/repo:/root/.axon_site \
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  python -u examples/iql/mujoco_finetune.py \
  --env_name cheetah-run --exp_name cql_state_entropy_lagrange \
  --algo_type cql --no_curl_contrastive_learning --gpu_id 0 \
  --data_path_real runs/flagship2/cheetah_entropy_state_50k.hdf5 \
  --data_mix_type all_state_1step_random_action \
  --with_lagrange --lagrange_thresh 10.0 \
  --num_epochs 0 --start_epoch -150 --num_trains_per_train_loop 2000 \
  --batch_size 256 --scan_training --eval_period 10 --no_video \
  --log_dir runs/flagship2/rl_logs
