#!/usr/bin/env bash
# Flagship offline CQL+SLAC at the reference's full budgets (SURVEY §6):
# 150 offline epochs x 2000 grad steps, batch 128, 100px 3-stack,
# 50k real + 50k S2P-generated transitions, aleatoric penalty lambda=2.
set -e
cd /root/repo
PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
exec python -u examples/iql/mujoco_finetune.py \
    --env_name cheetah-run \
    --exp_name cql_image_flagship \
    --algo_type cql \
    --image_rl \
    --no_curl_contrastive_learning \
    --gpu_id 0 \
    --slac_representation \
    --slac_policy_input_type feature_action \
    --slac_latent_model_load_dir runs/flagship/slac_model \
    --data_path_real runs/flagship/image_numpy_dataset_stack3_imgsize_100.hdf5 \
    --data_path_gen runs/flagship/all_state_1step_random_action_dataset_augment.hdf5 \
    --gan_checkpoint runs/flagship/checkpoints/cheetah_30.pkl \
    --data_mix_type all_state_1step_random_action \
    --data_mix_num_real 50000 \
    --data_mix_num_gen 50000 \
    --uncertainty_type aleatoric \
    --uncertainty_penalty_lambda 2 \
    --num_epochs 0 \
    --start_epoch -150 \
    --num_trains_per_train_loop 2000 \
    --batch_size 128 \
    --scan_training \
    --eval_period 10 \
    --save_video_period 50 \
    --log_dir runs/flagship/rl_logs
