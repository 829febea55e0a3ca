#!/usr/bin/env bash
# S2P-augmented image-based offline CQL (reference: run_cql_image.sh).
set -e
DATA_REAL=${DATA_REAL:-./data/trajwise/image_numpy_dataset_stack3_imgsize_100.hdf5}
DATA_GEN=${DATA_GEN:-./data/trajwise/all_state_1step_random_action_dataset_augment-rl.hdf5}
SLAC_DIR=${SLAC_DIR:-./slac_logs/model}

python examples/iql/mujoco_finetune.py \
    --env_name cheetah-run \
    --exp_name cql_image \
    --algo_type 'cql' \
    --image_rl \
    --no_curl_contrastive_learning \
    --gpu_id 0 \
    --slac_representation \
    --slac_policy_input_type 'feature_action' \
    --slac_latent_model_load_dir "$SLAC_DIR" \
    --data_path_real "$DATA_REAL" \
    --data_path_gen "$DATA_GEN" \
    --data_mix_type 'all_state_1step_random_action' \
    --data_mix_num_real 1000 \
    --data_mix_num_gen 1000 \
    --uncertainty_penalty_lambda 2 \
    --uncertainty_type 'aleatoric' \
    "$@"
