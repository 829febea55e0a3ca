#!/usr/bin/env bash
# Post-queue chaser v3 (round 4, session 10). The fourth VM recreation
# killed session 8's queue mid-walker; this session relaunched
# run_session8_queue.sh (covers walker chain + CQL + evals + fixed-arm
# rerun + multienv GAN). Once it releases the chip, spend remaining chip
# time on:
#   1. perf_probe.py — the step-cost ablation ladder committed at
#      7b7d0ac but never run on chip (the bench sweep showed the fast
#      path plateaus at ~7.7% of MXU roof; the probe attributes where
#      the step time actually goes, pointing at the next optimization).
#   2. bench.py refresh — fresh BENCH_CHIP_LAST.json for the driver's
#      end-of-round capture.
#   3. artifact collection.
# Usage: setsid nohup bash docs/flagship2/run_postqueue3.sh \
#          > runs/flagship2/postqueue3.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

QLOG=${QLOG:-runs/flagship2/session8_queue.log}
QPID=$(cat /tmp/queue.pid 2>/dev/null || echo 0)
echo "=== [$(date -u +%H:%M:%S)] post-queue chaser v3 armed (queue pid $QPID) ==="
while :; do
  grep -q "QUEUE COMPLETE" "$QLOG" 2>/dev/null && break
  if [ "$QPID" != 0 ] && ! ps -p "$QPID" >/dev/null 2>&1; then
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

run perf_probe python -u docs/flagship2/perf_probe.py --batch 256 --rolls 16
run bench_post python -u bench.py
run collect_post bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] POSTQUEUE3 COMPLETE ==="
