#!/usr/bin/env bash
# Round-5 chip parking (VERDICT r4 next-round #1b): the driver runs
# `python bench.py` at the round boundary, and in BOTH prior rounds the
# official artifact failed because the one tunneled chip was held by a
# queued training job (r4: rc=124 timeout mid-queue) or the relay was
# down (r3). This script guarantees an idle chip for the capture window:
#
#   1. sleeps until PARK_UTC (HH:MM, default 20:30 — ~70 min before the
#      8h round boundary for a 13:42 UTC start),
#   2. TERMs the known queue/chaser process GROUPS by recorded pid
#      (never by pattern — session rule), which takes their chip-holding
#      python children down with them,
#   3. runs one fresh `python bench.py` on the now-idle chip to refresh
#      docs/BENCH_CHIP_LAST.json,
#   4. collects artifacts + commits, and leaves the chip idle.
#
# Pid sources: /tmp/queue.pid (session-16 queue), /tmp/park_extra.pids
# (one pid per line — any manual chip jobs this session arms), plus the
# chaser pids recorded at arm time in /tmp/park_targets.pids.
# Usage: setsid nohup bash docs/flagship2/run_round_end_park.sh \
#          > runs/flagship2/round_end_park.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

PARK_UTC=${PARK_UTC:-20:30}
echo "=== [$(date -u +%H:%M:%S)] round-end park armed for $PARK_UTC UTC ==="

target_s=$(date -u -d "today $PARK_UTC" +%s)
now_s=$(date -u +%s)
# if the target already passed (script armed late), park immediately
if [ "$target_s" -gt "$now_s" ]; then
  sleep $(( target_s - now_s ))
fi
echo "=== [$(date -u +%H:%M:%S)] PARKING: stopping chip clients ==="

term_group() {  # TERM then (after grace) KILL a recorded pid's process group
  local pid=$1
  [ -n "$pid" ] || return 0
  ps -p "$pid" >/dev/null 2>&1 || return 0
  local pgid
  pgid=$(ps -o pgid= -p "$pid" | tr -d ' ')
  [ -n "$pgid" ] || return 0
  echo "    TERM pgid $pgid (pid $pid: $(ps -o args= -p "$pid" | cut -c1-80))"
  kill -TERM -- "-$pgid" 2>/dev/null || true
}

for f in /tmp/queue.pid /tmp/park_targets.pids /tmp/park_extra.pids; do
  [ -f "$f" ] || continue
  while read -r pid; do term_group "$pid"; done < "$f"
done
sleep 45
# hard-kill stragglers in the same recorded groups
for f in /tmp/queue.pid /tmp/park_targets.pids /tmp/park_extra.pids; do
  [ -f "$f" ] || continue
  while read -r pid; do
    ps -p "$pid" >/dev/null 2>&1 || continue
    pgid=$(ps -o pgid= -p "$pid" | tr -d ' ')
    [ -n "$pgid" ] && { echo "    KILL pgid $pgid"; kill -KILL -- "-$pgid" 2>/dev/null || true; }
  done < "$f"
done
sleep 15

# resume the SIGSTOPped full test suite (paused mid-round so the chip
# queue's host-side eval sampling wasn't starved on the 1-core box)
if [ -f /tmp/full_suite.pid ] && kill -0 "$(cat /tmp/full_suite.pid)" 2>/dev/null; then
  kill -CONT "$(cat /tmp/full_suite.pid)" && echo "=== resumed full suite ==="
fi

echo "=== [$(date -u +%H:%M:%S)] chip freed — refresh bench record ==="
if timeout 500 python -u bench.py > runs/flagship2/bench_park.log 2>&1; then
  echo "=== bench refresh OK: $(tail -c 300 runs/flagship2/bench_park.log | head -c 200) ==="
else
  echo "=== bench refresh FAILED (rc=$?) — chip stays idle for the driver ==="
fi

bash docs/flagship2/collect_artifacts.sh >> runs/flagship2/collect_park.log 2>&1 || true
git add -A docs runs/flagship2/*.log 2>/dev/null || true
git diff --cached --quiet || git commit -m "Round-end park: chip freed for driver bench capture; record refreshed" || true
echo "=== [$(date -u +%H:%M:%S)] PARK COMPLETE — chip idle for the driver ==="
