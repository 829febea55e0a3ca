#!/usr/bin/env bash
# Walker-CQL 10-path evals on host CPU (sequential; the on-chip variant
# pays ~100-200 ms relay dispatch per env step — the r3/r4 cheetah
# final evals also ran on CPU for this reason). JAX_PLATFORMS=cpu works
# here because PYTHONPATH omits /root/.axon_site, so the TPU plugin
# never registers.
# Usage: setsid nohup bash docs/flagship2/run_cpu_evals.sh \
#          > runs/flagship2/cpu_evals.log 2>&1 &
cd /root/repo
set -u
RUN_DIR=${RUN_DIR:-$(ls -dt runs/flagship2/walker_rl_logs/cql_image_walker/cql_* | head -1)}
echo "run_dir: $RUN_DIR"
CPUENV=(env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu
        JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_cpu)

for SNAP in best final; do
  echo "=== [$(date -u +%H:%M:%S)] START walker_cql_eval_${SNAP}_cpu ==="
  if "${CPUENV[@]}" python -u -m s2p_tpu.cli.final_eval \
      --run_dir "$RUN_DIR" --env_name walker-walk --snapshot "$SNAP" \
      --n_paths 10 --fallen_threshold 100 \
      >> "runs/flagship2/walker_cql_eval_${SNAP}_cpu.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  walker_cql_eval_${SNAP}_cpu ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  walker_cql_eval_${SNAP}_cpu (rc=$?) ==="
  fi
done
echo "=== [$(date -u +%H:%M:%S)] CPU EVALS COMPLETE ==="
