#!/usr/bin/env bash
# Low-frequency artifact collector: every 10 min, copy any round-4 run
# CSVs into their tracked docs/flagship2/ names (collect_artifacts.sh is
# idempotent). Purpose: runs/ is gitignored; if the round ends in the
# middle of a 60-85 min chip stage, the driver's end-of-round commit
# still picks up the partial progress.csv. Bounded (default 120 cycles =
# 20 h) so no ghost loop outlives the round by much; pid is written to
# /tmp/collect_loop.pid for exact-pid kills.
cd /root/repo
echo $$ > /tmp/collect_loop.pid
CYCLES=${1:-120}
for _ in $(seq 1 "$CYCLES"); do
  sleep 600
  bash docs/flagship2/collect_artifacts.sh >/dev/null 2>&1 || true
done
