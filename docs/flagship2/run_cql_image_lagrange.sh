#!/usr/bin/env bash
# Image-CQL flagship rerun WITH Lagrange (VERDICT r3 next-#2): identical
# to run_cheetah2_pipeline.sh cql except --with_lagrange --lagrange_thresh
# 10. The non-Lagrange run learned (278-348 for 100 epochs) then collapsed
# in the final 20 epochs with monotone dataset-Q drift +157 -> -195 —
# exactly the over-conservatism pathology the reference exposes
# --with_lagrange for (rlkit/torch/sac/cql_trainer.py:387-395).
# Done = final-epoch eval >= the 278-348 band (no terminal collapse) and a
# 10-path final eval on FINAL params >= ~300.
# CHIP JOB (~60 min). Run AFTER run_cql_state_lagrange.sh confirms the
# dual bounds Q on the cheap state leg.
set -e
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
exec python -u examples/iql/mujoco_finetune.py \
  --env_name cheetah-run --exp_name cql_image_entropy_lagrange \
  --algo_type cql --image_rl --no_curl_contrastive_learning --gpu_id 0 \
  --slac_representation --slac_policy_input_type feature_action \
  --slac_latent_model_load_dir runs/flagship2/cheetah2_slac_model \
  --data_path_real runs/flagship2/cheetah_entropy_image_100.hdf5 \
  --data_path_gen runs/flagship2/cheetah2_augment.hdf5 \
  --gan_checkpoint "${GAN_CKPT:-runs/flagship2/cheetah2_checkpoints/cheetah2_20.pkl}" \
  --data_mix_type all_state_1step_random_action \
  --data_mix_num_real 50000 --data_mix_num_gen 50000 \
  --uncertainty_type aleatoric --uncertainty_penalty_lambda 2 \
  --with_lagrange --lagrange_thresh 10.0 \
  --num_epochs 0 --start_epoch -150 --num_trains_per_train_loop 2000 \
  --batch_size 128 --scan_training --eval_period 10 \
  --save_video_period 50 --resume_dir runs/flagship2/cql2_lagrange_ckpt \
  --log_dir runs/flagship2/rl_logs
