#!/usr/bin/env bash
# Round-5 chip window, driven directly (replaces postqueue3/4b/5 after
# the on-chip 10-path final_eval turned out to pay ~100x per-step relay
# dispatch latency — 64+ min without completing vs seconds for the
# in-run scanned evals; both walker-CQL evals moved to host CPU where
# the per-step cost is local). VERDICT-r4 priority order:
#   1. bench.py headline (fresh idle-chip record + warms the driver's
#      compilation cache for the end-of-round capture)
#   2. gb_probe (fusion round 3: per-shape γ/β conv utilization + int8)
#   3. bench.py --sweep (full curve + end-to-end int8 A/B + r=96 cell)
#   4. lagrange_thresh sweep, cells 1,5,3,10 (park cuts the tail)
# Usage: setsid nohup bash docs/flagship2/run_r5_chip_window.sh \
#          > runs/flagship2/r5_chip_window.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
echo $$ >> /tmp/park_extra.pids

run() {
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
}

run bench_headline_r5 python -u bench.py
run gb_probe python -u docs/flagship2/gb_probe.py --batch 256 --iters 50
run bench_sweep_r5 python -u bench.py --sweep
run lagrange_sweep bash docs/flagship2/run_lagrange_thresh_sweep.sh
run lagrange_report python -u docs/flagship2/lagrange_sweep_report.py
run collect_w5 bash docs/flagship2/collect_artifacts.sh
git add -A docs runs/flagship2/*.log 2>/dev/null || true
git diff --cached --quiet || git commit -m "Round-5 chip window results: bench records, gb probe, lagrange sweep" || true
echo "=== [$(date -u +%H:%M:%S)] R5 CHIP WINDOW COMPLETE ==="
