#!/usr/bin/env bash
# Post-queue chaser v4 (round 4, session 11). Runs AFTER postqueue3
# (perf-probe ladder + bench refresh) releases the chip. Purpose: the
# round-3 walker IQL flagship's run dir (and its dataset generation)
# died with the VM recreations — its 506.5/583.5 headline survives only
# as a committed CSV. Re-run the full walker IQL protocol on THIS
# round's regenerated dataset so that (a) the walker IQL/CQL pair is a
# same-dataset comparison, and (b) the best-snapshot + fallen-rate eval
# features run against a live IQL run dir (VERDICT r3 weak #3/#4 on the
# IQL leg, previously demonstrated only against CQL).
# Usage: setsid nohup bash docs/flagship2/run_postqueue4.sh \
#          > runs/flagship2/postqueue4.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

P3LOG=runs/flagship2/postqueue3.log
echo "=== [$(date -u +%H:%M:%S)] post-queue chaser v4 armed (waits on postqueue3) ==="
while :; do
  grep -q "POSTQUEUE3 COMPLETE" "$P3LOG" 2>/dev/null && break
  sleep 60
done
echo "=== [$(date -u +%H:%M:%S)] chip released — walker IQL rerun ==="

run() {
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
}

# Stall-watchdog run (resumable via --resume_dir): log idle >30 min
# kills the try; orbax resume continues from the last checkpoint.
run_watchdog() {
  local name=$1 done_path=$2 stall=$3 tries=$4; shift 4
  if [ -e "$done_path" ]; then
    echo "=== SKIP $name ($done_path exists) ==="
    return 0
  fi
  local log="runs/flagship2/${name}.log" try=0
  while [ "$try" -lt "$tries" ]; do
    try=$((try + 1))
    echo "=== [$(date -u +%H:%M:%S)] START $name (try $try/$tries) ==="
    "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age
      age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ "$age" -gt "$stall" ]; then
        echo "=== [$(date -u +%H:%M:%S)] STALL $name (log idle ${age}s) — killing pid $pid ==="
        kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"; local rc=$?
    if [ "$rc" -eq 0 ]; then
      echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
      touch "$done_path"
      return 0
    fi
    echo "=== [$(date -u +%H:%M:%S)] $name exited rc=$rc — will resume ==="
    sleep 30
  done
  echo "=== [$(date -u +%H:%M:%S)] GIVE-UP $name after $tries tries ==="
}

WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_best.pkl
[ -e "$WK_GAN" ] || WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_30.pkl

run_watchdog walker_iql_r4 runs/flagship2/.done_walker_iql_r4 1800 4 \
  bash docs/flagship2/run_walker_iql.sh "$WK_GAN"

WK_IQL_RUN=$(ls -dt runs/flagship2/walker_rl_logs/iql_image_walker_flagship/iql_* 2>/dev/null | head -1)
if [ -n "$WK_IQL_RUN" ]; then
  run walker_iql_final_eval_best python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_IQL_RUN" --env_name walker-walk --snapshot best \
    --n_paths 10 --fallen_threshold 100
  run walker_iql_final_eval_final python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_IQL_RUN" --env_name walker-walk --snapshot final \
    --n_paths 10 --fallen_threshold 100
fi

run collect_post4 bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] POSTQUEUE4 COMPLETE ==="
