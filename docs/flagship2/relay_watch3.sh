#!/usr/bin/env bash
# Relay watcher v3 (round 4, session 13). Failure mode: the chip executor
# came up wedged right at the session-13 queue launch — the queue's FIRST
# compile RPC (collect_dataset's SAC step, 22:57 UTC) futex-blocked
# forever while jax.devices() kept succeeding; a fresh-process 256x256
# matmul probe also hung (the session-10 signature, but this time with NO
# concurrent client: the wedge pre-existed the launch, presumably stale
# server-side state from the sixth VM recreation).
#
# State at arm time: queue + its collect child + both postqueue chasers
# killed by recorded pid (the queue cannot make progress and the chasers
# would have fired probes into the wedged chip once the queue pid died).
#
# When COMPUTE (not enumeration) returns: relaunch run_session9_queue.sh
# (idempotent; only ~1000 collect steps were lost) and re-arm the
# postqueue chasers against the fresh queue pid.
# Usage: setsid nohup bash docs/flagship2/relay_watch3.sh \
#          > runs/flagship2/relay_watch3.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
HOURS=${1:-10}
DEADLINE=$(( $(date +%s) + HOURS*3600 ))
echo "[watch3 $(date -u +%H:%M:%S)] armed (deadline ${HOURS}h)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((128, 128))
(x @ x).block_until_ready()" >/dev/null 2>&1; then
    echo "[watch3 $(date -u +%H:%M:%S)] compute UP — relaunching queue"
    setsid nohup bash -c 'echo $$ > /tmp/queue.pid; exec bash docs/flagship2/run_session9_queue.sh' \
      > runs/flagship2/session8_queue.log 2>&1 &
    sleep 5
    echo "[watch3 $(date -u +%H:%M:%S)] queue pid $(cat /tmp/queue.pid)"
    setsid nohup bash docs/flagship2/run_postqueue3.sh \
      > runs/flagship2/postqueue3.log 2>&1 &
    setsid nohup bash docs/flagship2/run_postqueue4.sh \
      > runs/flagship2/postqueue4.log 2>&1 &
    echo "[watch3 $(date -u +%H:%M:%S)] chasers re-armed"
    exit 0
  fi
  echo "[watch3 $(date -u +%H:%M:%S)] compute still wedged"
  sleep 180
done
echo "[watch3 $(date -u +%H:%M:%S)] deadline reached, compute never returned"
