#!/usr/bin/env bash
# Follower for the round-5 Lagrange sweep: cell th=1 railed α′ at the
# 1e6 clamp with a recovered raw action gap of ~18 — every queued
# threshold (1,3,5,10) sits BELOW the gap's natural scale on this leg,
# so the dual saturates in all of them and none demonstrates the
# interior regime. This adds the decisive thresh=25 (> gap) cell once
# the main sweep completes, then regenerates the report over ALL cells
# (the generator globs th*; its final appended section supersedes any
# earlier one).
# Usage: setsid nohup bash docs/flagship2/run_lagrange_th25_follower.sh \
#          > runs/flagship2/lagrange_th25.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo $$ >> /tmp/park_extra.pids

echo "=== [$(date -u +%H:%M:%S)] th=25 follower armed (waits on R5 CHIP WINDOW COMPLETE) ==="
while :; do
  grep -q "R5 CHIP WINDOW COMPLETE" runs/flagship2/r5_chip_window.log 2>/dev/null && break
  sleep 30
done
echo "=== [$(date -u +%H:%M:%S)] chip free — running thresh=25 cell ==="
THRESHES=25 bash docs/flagship2/run_lagrange_thresh_sweep.sh \
  >> runs/flagship2/lagrange_sweep.log 2>&1 || true
python -u docs/flagship2/lagrange_sweep_report.py \
  >> runs/flagship2/lagrange_report.log 2>&1 || true
bash docs/flagship2/collect_artifacts.sh >> runs/flagship2/collect_th25.log 2>&1 || true
git add -A docs runs/flagship2/*.log 2>/dev/null || true
git diff --cached --quiet || git commit -m "Lagrange sweep: thresh=25 interior-regime cell + final report" || true
echo "=== [$(date -u +%H:%M:%S)] TH25 FOLLOWER COMPLETE ==="
