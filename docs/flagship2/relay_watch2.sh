#!/usr/bin/env bash
# Relay watcher v2 (round 4, session 10). Failure mode this round:
# jax.devices() succeeds (enumeration RPC fine) but every compile/execute
# RPC futex-blocks forever — concurrent clients wedged the chip executor
# at ~11:03 UTC while queue stage 3 (walker SLAC) was training. State at
# arm time: session-8 queue bash (pid $QPID) SIGSTOPped mid-stage-3 with
# its SLAC child killed; walker_slac_model on disk is a PARTIAL 54k/300k
# checkpoint that stage 5 (walker CQL) must NOT consume.
#
# When COMPUTE (not just enumeration) returns:
#   1. rerun slac_pretrain to completion (fresh 300k; save_dir overwrite)
#   2. SIGCONT the queue — it reaps the dead SLAC child, sees the (now
#      complete) model dir, and proceeds to stage 4 (GAN) with a free chip
# If the VM is recreated instead, this watcher dies with it and the next
# session relaunches run_session9_queue.sh from scratch.
# Usage: setsid nohup bash docs/flagship2/relay_watch2.sh \
#          > runs/flagship2/relay_watch2.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
QPID=${1:-1842}
HOURS=${2:-10}
DEADLINE=$(( $(date +%s) + HOURS*3600 ))
echo "[watch2 $(date -u +%H:%M:%S)] armed (queue pid $QPID stopped)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
(x @ x).block_until_ready()" >/dev/null 2>&1; then
    echo "[watch2 $(date -u +%H:%M:%S)] compute UP — rerunning walker SLAC"
    LOG=runs/flagship2/slac_walker_retry.log
    ok=0
    for try in 1 2 3; do
      touch "$LOG"  # reset the idle clock — O_APPEND open won't update mtime
      python -u slac_pretrain.py \
        --dataset runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5 \
        --save_dir runs/flagship/walker_slac_model --scan_chunk 1000 \
        >> "$LOG" 2>&1 &
      pid=$!
      while kill -0 "$pid" 2>/dev/null; do
        sleep 60
        age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
        if [ "$age" -gt 900 ]; then
          echo "[watch2 $(date -u +%H:%M:%S)] SLAC try $try wedged (log idle ${age}s) — killing $pid"
          kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
          break
        fi
      done
      if wait "$pid"; then
        ok=1
        echo "[watch2 $(date -u +%H:%M:%S)] SLAC complete (try $try)"
        break
      fi
      sleep 60
    done
    [ "$ok" = 1 ] || echo "[watch2 $(date -u +%H:%M:%S)] SLAC rerun gave up — resuming queue anyway; stage-5 inputs may be partial"
    echo "[watch2 $(date -u +%H:%M:%S)] resuming queue $QPID"
    kill -CONT "$QPID" 2>/dev/null
    exit 0
  fi
  echo "[watch2 $(date -u +%H:%M:%S)] compute still wedged"
  sleep 120
done
echo "[watch2 $(date -u +%H:%M:%S)] deadline reached"
kill -CONT "$QPID" 2>/dev/null
exit 1
