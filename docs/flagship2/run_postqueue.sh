#!/usr/bin/env bash
# SUPERSEDED (round 4, session 10): watched the dead regen queue and
# its run() helper always returns 0 so `run ... && touch .done` marks
# failed stages done. Kept for history only — relaunch work with
# run_session9_queue.sh / run_postqueue3.sh instead.
# Post-queue chaser (round 4, session 7). Waits for run_regen_queue.sh
# (pid file /tmp/regen_queue.pid, else polls the log for the COMPLETE
# marker) to release the chip, then uses the remaining chip time for:
#   1. fixed-arm state-CQL rerun on the ROUND-4 regenerated dataset —
#      upgrades the Lagrange A/B from cross-dataset (fixed arm = round-3
#      dataset) to same-dataset (both arms on cheetah_entropy_state_50k
#      regenerated 2026-08-18; see ROUND4_NOTES session 5 caveat).
#   2. bench.py refresh — the 15:56 run's vs_a6000_estimate came back
#      null (relay cost-analysis failure); bench.py has since grown a
#      labeled fallback constant, so this run lands the estimate in
#      docs/BENCH_CHIP_LAST.json for the driver's end-of-round capture.
#   3. artifact collection.
# Stages are idempotent (skip on existing outputs).
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

QLOG=runs/flagship2/regen_queue.log
echo "=== [$(date -u +%H:%M:%S)] post-queue chaser armed ==="
while :; do
  grep -q "REGEN QUEUE COMPLETE" "$QLOG" 2>/dev/null && break
  # belt-and-braces: if the queue process is gone, don't wait forever
  pgrep -x bash >/dev/null 2>&1 || true
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

# 1. fixed-arm state-CQL on the regenerated dataset (same-dataset A/B)
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

# 2. bench refresh (writes docs/BENCH_CHIP_LAST.json with the estimate)
run bench_postqueue python bench.py

# 3. collect + results table
run collect_artifacts_postqueue bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] POST-QUEUE CHASER COMPLETE ==="
