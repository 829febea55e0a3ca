#!/usr/bin/env bash
# CQL-positive-artifact experiment (VERDICT r2 #3): the full cheetah
# pipeline on the HIGHER-ENTROPY dataset (collect_dataset.py
# --target_entropy -3 => action saturation 30.7% -> 23.8%), at the
# reference's budgets. Stages gate on each other; run them in order.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
stage=${1:?usage: run_cheetah2_pipeline.sh slac/augment/gan/cql/cql_state}

case "$stage" in
  slac)  # chip, ~25 min
    exec python -u slac_pretrain.py \
      --dataset runs/flagship2/cheetah_entropy_image_100.hdf5 \
      --save_dir runs/flagship2/cheetah2_slac_model --scan_chunk 1000 ;;
  augment)  # host CPU, ~12 min
    exec env JAX_PLATFORMS=cpu python -u state_transition_rollout.py \
      --dataset runs/flagship2/cheetah_entropy_image_100.hdf5 \
      --output runs/flagship2/cheetah2_augment.hdf5 ;;
  gan)  # chip, ~65 min
    exec python -u train.py \
      --dataroot runs/flagship2/cheetah_entropy_image_100.hdf5 \
      --env_type cheetah2 --netG s2p --batchSize 16 --bf16 --niter 30 \
      --scan_chunk 625 --save_epoch_freq 10 \
      --checkpoints_dir runs/flagship2/cheetah2_checkpoints \
      --log_dir runs/flagship2/cheetah2_gan_logs \
      --resume_dir runs/flagship2/cheetah2_gan_ckpt --eval_num 256 ;;
  gan_r1)  # chip, ~70 min: same protocol + lazy-R1 (the no-decay A/B —
           # the no-R1 run peaked 33.93/0.956 at epoch 25 then decayed to
           # 30.14/0.817 by 30; see ROUND3_NOTES "Cheetah2 pipeline")
    exec python -u train.py \
      --dataroot runs/flagship2/cheetah_entropy_image_100.hdf5 \
      --env_type cheetah2r1 --netG s2p --batchSize 16 --bf16 --niter 30 \
      --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 10 \
      --checkpoints_dir runs/flagship2/cheetah2r1_checkpoints \
      --log_dir runs/flagship2/cheetah2r1_gan_logs \
      --resume_dir runs/flagship2/cheetah2r1_gan_ckpt --eval_num 256 ;;
  cql)  # chip, ~60 min
    exec python -u examples/iql/mujoco_finetune.py \
      --env_name cheetah-run --exp_name cql_image_entropy \
      --algo_type cql --image_rl --no_curl_contrastive_learning --gpu_id 0 \
      --slac_representation --slac_policy_input_type feature_action \
      --slac_latent_model_load_dir runs/flagship2/cheetah2_slac_model \
      --data_path_real runs/flagship2/cheetah_entropy_image_100.hdf5 \
      --data_path_gen runs/flagship2/cheetah2_augment.hdf5 \
      --gan_checkpoint "${GAN_CKPT:-runs/flagship2/cheetah2_checkpoints/cheetah2_20.pkl}" \
      --data_mix_type all_state_1step_random_action \
      --data_mix_num_real 50000 --data_mix_num_gen 50000 \
      --uncertainty_type aleatoric --uncertainty_penalty_lambda 2 \
      --num_epochs 0 --start_epoch -150 --num_trains_per_train_loop 2000 \
      --batch_size 128 --scan_training --eval_period 10 \
      --save_video_period 50 --resume_dir runs/flagship2/cql2_ckpt \
      --log_dir runs/flagship2/rl_logs ;;
  cql_state)  # CQL on state observations, new dataset. NOTE: despite
              # JAX_PLATFORMS=cpu, the axon sitecustomize overrides the
              # env var and this executed ON THE CHIP (69 it/s; ~3-6
              # it/s is the true 1-core CPU rate) — treat recorded
              # timings as chip numbers
    exec env JAX_PLATFORMS=cpu python -u examples/iql/mujoco_finetune.py \
      --env_name cheetah-run --exp_name cql_state_entropy \
      --algo_type cql --no_curl_contrastive_learning --gpu_id 0 \
      --data_path_real runs/flagship2/cheetah_entropy_state_50k.hdf5 \
      --data_mix_type all_state_1step_random_action \
      --num_epochs 0 --start_epoch -150 --num_trains_per_train_loop 2000 \
      --batch_size 256 --scan_training --eval_period 10 --no_video \
      --log_dir runs/flagship2/rl_logs ;;
esac
