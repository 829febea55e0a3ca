#!/usr/bin/env bash
# Post-queue chaser v4b (round 4, session 16): the session-11 v4 with
# its helper copies replaced by queue_lib.sh (the v4 copy had the
# stale-log-mtime stall bug and silently diverged from the queue's
# helpers — no collect after tries). Runs AFTER postqueue3 (perf-probe
# ladder + bench refresh) releases the chip: re-runs the full walker IQL
# protocol on this round's regenerated dataset so (a) the walker IQL/CQL
# pair is a same-dataset comparison and (b) the best-snapshot +
# fallen-rate eval features run against a live IQL run dir.
# Usage: setsid nohup bash docs/flagship2/run_postqueue4b.sh \
#          > runs/flagship2/postqueue4.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p runs/flagship2

. docs/flagship2/queue_lib.sh

P3LOG=${P3LOG:-runs/flagship2/postqueue3.log}
echo "=== [$(date -u +%H:%M:%S)] post-queue chaser v4b armed (waits on postqueue3) ==="
while :; do
  grep -q "POSTQUEUE3 COMPLETE" "$P3LOG" 2>/dev/null && break
  sleep 60
done
echo "=== [$(date -u +%H:%M:%S)] chip released — walker IQL rerun ==="

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
