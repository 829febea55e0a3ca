#!/usr/bin/env bash
# Round-4 relay watcher: probe the tunneled-TPU backend until it
# initializes, then launch the staged chip queue exactly once.
# The probe runs jax.devices() in a subprocess with a timeout because
# the axon plugin blocks in a reconnect loop while the relay is down
# (observed rounds 3-4). Single plain command per background job —
# no compound backgrounding (see round-3 ghost-process postmortem).
cd /root/repo
set -u
HOURS=${1:-11}
DEADLINE=$(( $(date +%s) + HOURS*3600 ))
echo "[watch $(date -u +%H:%M:%S)] armed; probing every cycle until $(date -u -d @$DEADLINE +%H:%M:%S)"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  # Require a NON-CPU platform: if the axon plugin fails fast instead of
  # blocking, jax falls back to CPU and a bare jax.devices() probe would
  # "succeed" — launching every chip job onto this 1-core host.
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" >/dev/null 2>&1; then
    echo "[watch $(date -u +%H:%M:%S)] backend UP — launching chip queue"
    bash docs/flagship2/run_chip_queue.sh
    echo "[watch $(date -u +%H:%M:%S)] chip queue finished"
    exit 0
  fi
  echo "[watch $(date -u +%H:%M:%S)] backend still down"
  sleep 60
done
echo "[watch $(date -u +%H:%M:%S)] deadline reached; relay never returned"
exit 1
