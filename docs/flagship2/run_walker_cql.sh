#!/usr/bin/env bash
# Walker CQL leg (extra evidence: the reference's second entry script,
# run_cql_image.sh, on the second env family) — same data/budgets as the
# walker IQL flagship (50k real + 50k on-device S2P-generated, aleatoric
# lambda=2, 150x2000 batch 128).
set -e
cd /root/repo
GAN_CKPT=${1:-runs/flagship2/walker_r1_checkpoints/walker_30.pkl}
PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
exec python -u examples/iql/mujoco_finetune.py \
    --env_name walker-walk \
    --exp_name cql_image_walker \
    --algo_type cql \
    --image_rl \
    --no_curl_contrastive_learning \
    --gpu_id 0 \
    --slac_representation \
    --slac_policy_input_type feature_action \
    --slac_latent_model_load_dir runs/flagship/walker_slac_model \
    --data_path_real runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5 \
    --data_path_gen runs/flagship/walker_augment.hdf5 \
    --gan_checkpoint "$GAN_CKPT" \
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
    --resume_dir runs/flagship2/walker_cql_ckpt \
    --log_dir runs/flagship2/walker_rl_logs
