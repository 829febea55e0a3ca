#!/usr/bin/env bash
# Round-5 chaser: runs after postqueue4b (walker IQL rerun) releases the
# chip. Spends the remaining pre-park chip window on, in VERDICT-r4
# priority order:
#   1. gb_probe — per-shape γ/β conv utilization + int8 A/B (fusion
#      round 3 evidence; adoption only on a measured win)
#   2. bench.py --sweep — full dispatch curve refresh with the corrected
#      rooflines, the r=96 cell, and the pinned torch-twin denominator
#   3. lagrange_thresh sweep (walker image leg, 4 cells) + report
#   4. artifact collection + commit
# The round-end park script (20:30 UTC) kills this group if still
# running — arm it in /tmp/park_extra.pids.
# Usage: setsid nohup bash docs/flagship2/run_postqueue5.sh \
#          > runs/flagship2/postqueue5.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo $$ >> /tmp/park_extra.pids

P4LOG=${P4LOG:-runs/flagship2/postqueue4.log}
echo "=== [$(date -u +%H:%M:%S)] postqueue5 armed (waits on postqueue4b) ==="
while :; do
  grep -q "POSTQUEUE4 COMPLETE" "$P4LOG" 2>/dev/null && break
  sleep 60
done
echo "=== [$(date -u +%H:%M:%S)] chip released — round-5 chip window ==="

run() {
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
}

run gb_probe python -u docs/flagship2/gb_probe.py --batch 256 --iters 50
run bench_sweep_r5 python -u bench.py --sweep
run lagrange_sweep bash docs/flagship2/run_lagrange_thresh_sweep.sh
run lagrange_report python -u docs/flagship2/lagrange_sweep_report.py
run collect_p5 bash docs/flagship2/collect_artifacts.sh
git add -A docs runs/flagship2/*.log 2>/dev/null || true
git diff --cached --quiet || git commit -m "Round-5 chip window: gb-conv probe, bench sweep refresh, lagrange_thresh sweep" || true
echo "=== [$(date -u +%H:%M:%S)] POSTQUEUE5 COMPLETE ==="
