#!/usr/bin/env bash
# Round-4 chip queue: runs every staged job sequentially with logging so
# zero chip time is lost between jobs (relay was down from round 3
# through round 4's start). Each stage appends to its own log under
# runs/flagship2/ and the queue continues past individual failures.
# Usage: nohup bash docs/flagship2/run_chip_queue.sh > runs/flagship2/queue.log 2>&1 &
cd /root/repo
set -u

run() {
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
  # collect after EVERY stage: runs/ is gitignored, docs/ is tracked —
  # if the round ends mid-queue the driver still commits partial CSVs
  bash docs/flagship2/collect_artifacts.sh \
    >> runs/flagship2/collect_artifacts.log 2>&1 || true
}

# 1. bench refresh — the official scoreboard currently holds a CPU
#    fallback; this produces the chip number + the new batch sweep
run bench_r4 python bench.py

# 2. cheetah2 GAN+R1 completion (resume from epoch 6) — the R1-default A/B
run cheetah2_gan_r1 bash docs/flagship2/run_cheetah2_pipeline.sh gan_r1

# 3. CQL-Lagrange A/B on the state leg (~75 min)
run cql_state_lagrange bash docs/flagship2/run_cql_state_lagrange.sh

# 4. image-CQL rerun with Lagrange (~60 min) — the late-collapse fix
run cql_image_lagrange bash docs/flagship2/run_cql_image_lagrange.sh

# 5. walker CQL leg (~85 min) — completes the 2x2 env x algo matrix
run walker_cql bash docs/flagship2/run_walker_cql.sh

# 6. full-res multi-env GAN (~35 min)
run multienv_gan bash docs/flagship2/run_multienv_gan.sh 10

# 7. framework-feature final evals (best snapshot + fallen rate)
WALKER_RUN=$(ls -dt runs/flagship2/walker_rl_logs/iql_image_walker_flagship/iql_* | head -1)
run walker_final_eval_best env PYTHONPATH=/root/repo:/root/.axon_site \
  python -m s2p_tpu.cli.final_eval --run_dir "$WALKER_RUN" \
  --env_name walker-walk --snapshot best --n_paths 10 \
  --fallen_threshold 100

# 8. collect canonical CSVs into docs/ and regenerate the results table
run collect_artifacts bash docs/flagship2/collect_artifacts.sh

echo "=== [$(date -u +%H:%M:%S)] QUEUE COMPLETE ==="
