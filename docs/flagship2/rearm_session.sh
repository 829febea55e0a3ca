#!/usr/bin/env bash
# One-command session rearm after a VM recreation (round 4+ pattern:
# the VM hosting this build has been recreated 7+ times; runs/ and all
# background processes die each time, only git survives). Run this
# FIRST in a fresh session:
#   bash docs/flagship2/rearm_session.sh
# It (1) launches bench.py on the chip for fresh scoreboard evidence,
# (2) relaunches the idempotent regen queue (session-16 version:
# never-landed-first ordering, queue_lib helpers, committed-CSV skips)
# which waits for the bench to release the chip, (3) arms the postqueue
# chasers and the docs autocommit loop.
# Everything is detached (setsid) and logs under runs/flagship2/.
# NEVER run ad-hoc chip probes while the queue is on a training stage —
# two concurrent chip clients wedged the executor in session 10.
cd /root/repo
set -u
mkdir -p runs/flagship runs/flagship2

if [ -f /tmp/queue.pid ] && kill -0 "$(cat /tmp/queue.pid)" 2>/dev/null; then
  echo "queue already running (pid $(cat /tmp/queue.pid)) — nothing to do"
  exit 0
fi

# 1: bench first (chip evidence before anything can die)
setsid nohup python -u bench.py > runs/flagship2/bench_rearm.log 2>&1 &
sleep 2
ps aux | grep -v grep | grep "python -u bench.py" | awk '{print $2}' | head -1 > /tmp/bench.pid
echo "bench pid $(cat /tmp/bench.pid)"

# 2: the regen queue (stage 0 waits on /tmp/bench.pid; the queue records
#    its own pid into /tmp/queue.pid via echo $$)
QLOG=runs/flagship2/session16_queue.log
setsid nohup bash docs/flagship2/run_session16_queue.sh > "$QLOG" 2>&1 &
sleep 2
echo "queue pid $(cat /tmp/queue.pid 2>/dev/null || echo '(pending)')"

# 3: chasers + autocommit
QLOG="$QLOG" setsid nohup \
  bash docs/flagship2/run_postqueue3.sh > runs/flagship2/postqueue3.log 2>&1 &
setsid nohup bash docs/flagship2/run_postqueue4b.sh \
  > runs/flagship2/postqueue4.log 2>&1 &
setsid nohup bash docs/flagship2/autocommit_loop2.sh \
  > runs/flagship2/autocommit.log 2>&1 &
sleep 1
echo "rearm complete — monitor $QLOG"
