#!/usr/bin/env bash
# Fixed-arm state-CQL rerun on the round-4 REGENERATED entropy dataset —
# the single source of truth for this protocol (previously copy-pasted
# into run_postqueue.sh / run_postqueue2.sh / run_session8_queue.sh;
# divergent copies would silently unbalance the same-dataset Lagrange
# A/B). Arm config mirrors run_cql_state_lagrange.sh minus the dual.
set -e
cd /root/repo
CH_STATE=${1:-runs/flagship2/cheetah_entropy_state_50k.hdf5}
PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
exec python -u examples/iql/mujoco_finetune.py \
    --env_name cheetah-run \
    --exp_name cql_state_entropy_fixed_r4 \
    --algo_type cql \
    --no_curl_contrastive_learning \
    --gpu_id 0 \
    --data_path_real "$CH_STATE" \
    --data_mix_type all_state_1step_random_action \
    --min_q_weight 5.0 \
    --num_epochs 0 \
    --start_epoch -150 \
    --num_trains_per_train_loop 2000 \
    --batch_size 256 \
    --scan_training \
    --eval_period 10 \
    --no_video \
    --log_dir runs/flagship2/rl_logs
