#!/usr/bin/env bash
# Shared queue/chaser helpers (round 4, session 16) — consolidates the
# run/run_watchdog near-copies that had drifted across
# run_session14_queue.sh, run_postqueue4.sh and relay_watch2.sh (the
# stall-logic bug below existed in all three). Source it:
#   . docs/flagship2/queue_lib.sh
# Fixes over the copies:
#  - run_watchdog touches the stage log right before each spawn: the log
#    is opened O_APPEND, which does not update mtime on open, so a retry
#    after a stall-kill inherited the PREVIOUS try's last-write time and
#    was itself killed at its first 60 s check (age already > stall
#    while the healthy retry was still silently initializing jax).
#  - done markers must be success-only sentinel paths (e.g.
#    runs/.../.done_slac), NOT incremental artifacts — latent.pkl is
#    written every 5k steps, so marking the SLAC stage done by that file
#    would let a relaunch skip the stage with a half-trained model.
#  - collect-after-try is controlled by QUEUE_COLLECT (default 1) so the
#    chasers and the queue share one implementation instead of
#    divergent copies.

QUEUE_COLLECT=${QUEUE_COLLECT:-1}

collect() {
  [ "$QUEUE_COLLECT" = 1 ] || return 0
  bash docs/flagship2/collect_artifacts.sh \
    >> runs/flagship2/collect_artifacts.log 2>&1 || true
}

run() {  # run <name> <cmd...>: log to its own file, never abort the queue
  local name=$1 rc=0; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    rc=$?
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$rc) — continuing ==="
  fi
  collect
  return "$rc"
}

# run_watchdog <name> <done_path> <stall_secs> <max_tries> <cmd...>
# Background the command, kill it if its log goes idle > stall_secs
# (resumable stages continue from their checkpoints on the next try),
# write the success-only done marker when it exits 0.
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
    touch "$log"  # reset the idle clock — O_APPEND open won't
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
      mkdir -p "$(dirname "$done_path")"
      [ -e "$done_path" ] || touch "$done_path"
      collect
      return 0
    fi
    echo "=== [$(date -u +%H:%M:%S)] $name exited rc=$rc — will resume ==="
    collect
    sleep 30
  done
  echo "=== [$(date -u +%H:%M:%S)] GIVE-UP $name after $tries tries ==="
  return 1
}

# csv_done <committed_csv> <min_lines>: true when a git-tracked progress
# CSV already carries the full protocol (header + epochs), letting a
# relaunched queue skip regenerating results that survived a VM
# recreation in docs/.
csv_done() {
  [ -f "$1" ] && [ "$(wc -l < "$1")" -ge "$2" ]
}
