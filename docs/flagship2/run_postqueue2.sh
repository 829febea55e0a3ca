#!/usr/bin/env bash
# SUPERSEDED (round 4, session 10): watched the dead regen queue and
# its run() helper always returns 0 so `run ... && touch .done` marks
# failed stages done. Kept for history only — relaunch work with
# run_session9_queue.sh / run_postqueue3.sh instead.
# Post-queue chaser v2 (round 4, session 7). Supersedes run_postqueue.sh
# (disarmed): the walker CQL chip job wedged at epoch -46 on a hung
# relay RPC (process futex-blocked, CPU clock frozen, relay itself alive
# — killed by pid after 20 min). Orbax resume state is at epoch -46, so
# the priority once the regen queue releases the chip is:
#   1. resume walker CQL to completion (VERDICT #3, the 2x2 matrix)
#   2. 10-path final evals (best + final snapshots) on the completed run
#   3. fixed-arm state-CQL rerun on the regenerated dataset
#      (upgrades the Lagrange A/B to same-dataset)
#   4. bench.py refresh (lands the A6000 estimate via the new fallback)
#   5. artifact collection
# All stages idempotent; chip jobs strictly serial.
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

QLOG=runs/flagship2/regen_queue.log
echo "=== [$(date -u +%H:%M:%S)] post-queue chaser v2 armed ==="
while :; do
  grep -q "REGEN QUEUE COMPLETE" "$QLOG" 2>/dev/null && break
  if ! ps -p "${REGEN_PID:-1177}" >/dev/null 2>&1; then
    echo "=== queue process gone without COMPLETE marker — proceeding ==="
    break
  fi
  sleep 60
done
echo "=== [$(date -u +%H:%M:%S)] queue released the chip ==="

run() {
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
}

# 1. walker CQL resume (orbax state in runs/flagship2/walker_cql_ckpt)
WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_best.pkl
[ -e "$WK_GAN" ] || WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_30.pkl
if [ ! -e runs/flagship2/.done_walker_cql_resume ]; then
  run walker_cql_resume bash docs/flagship2/run_walker_cql.sh "$WK_GAN" \
    && touch runs/flagship2/.done_walker_cql_resume
fi

# 2. final evals on the completed walker CQL run (chip; quick)
WK_CQL_RUN=$(ls -dt runs/flagship2/walker_rl_logs/cql_image_walker/cql_* 2>/dev/null | head -1)
if [ -n "$WK_CQL_RUN" ]; then
  run walker_cql_final_eval_best python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot best \
    --n_paths 10 --fallen_threshold 100
  run walker_cql_final_eval_final python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot final \
    --n_paths 10 --fallen_threshold 100
fi

# 3. fixed-arm state-CQL on the regenerated dataset (same-dataset A/B)
if [ ! -e runs/flagship2/.done_cql_state_fixed_rerun ]; then
  run cql_state_fixed_rerun \
    python -u examples/iql/mujoco_finetune.py \
      --env_name cheetah-run --exp_name cql_state_entropy_fixed_r4 \
      --algo_type cql --no_curl_contrastive_learning --gpu_id 0 \
      --data_path_real runs/flagship2/cheetah_entropy_state_50k.hdf5 \
      --data_mix_type all_state_1step_random_action \
      --min_q_weight 5.0 \
      --num_epochs 0 --start_epoch -150 --num_trains_per_train_loop 2000 \
      --batch_size 256 --scan_training --eval_period 10 --no_video \
      --log_dir runs/flagship2/rl_logs \
  && touch runs/flagship2/.done_cql_state_fixed_rerun
fi

# 4. bench refresh (writes docs/BENCH_CHIP_LAST.json with the estimate)
run bench_postqueue python bench.py

# 5. collect + results table
run collect_artifacts_postqueue bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] POST-QUEUE CHASER v2 COMPLETE ==="
