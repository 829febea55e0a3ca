#!/usr/bin/env bash
# Round-4 session-14 queue — seventh VM recreation. Reordering rationale:
# with the VM dying every ~3-6 h, the stages that have NEVER landed go
# first (they are the only ones whose loss costs information):
#   fixed-arm state-CQL rerun (same-dataset Lagrange A/B) and
#   multi-env GAN (VERDICT r3 #6)
# then the walker chain (SLAC → GAN+R1 → CQL → flag-driven evals), whose
# results have all been reproduced 1-4x in earlier sessions and whose
# value now is the protocol-scale run dir for the best/final-snapshot
# eval features. Helpers are the session-9 fixed versions (done-marker
# only on success; exit codes propagate; newest run dir for evals).
# Usage:
#   setsid nohup bash docs/flagship2/run_session14_queue.sh \
#     > runs/flagship2/session14_queue.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p runs/flagship runs/flagship2

CPUENV=(env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu)

collect() {
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

skip_or_run() {  # skip_or_run <name> <done_path> <cmd...>
  local name=$1 done_path=$2; shift 2
  if [ -e "$done_path" ]; then
    echo "=== SKIP $name ($done_path exists) ==="
    return 0
  fi
  if run "$name" "$@"; then
    [ -e "$done_path" ] || { mkdir -p "$(dirname "$done_path")"; touch "$done_path"; }
  fi
}

# run_watchdog <name> <done_path> <stall_secs> <max_tries> <cmd...>
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
      [ -e "$done_path" ] || touch "$done_path"
      collect
      return 0
    fi
    echo "=== [$(date -u +%H:%M:%S)] $name exited rc=$rc — will resume ==="
    collect
    sleep 30
  done
  echo "=== [$(date -u +%H:%M:%S)] GIVE-UP $name after $tries tries ==="
}

WK_STATE=runs/flagship/walker_state_50k.hdf5
WK_IMG=runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5
WK_AUG=runs/flagship/walker_augment.hdf5
CH_STATE=runs/flagship2/cheetah_entropy_state_50k.hdf5
CH_IMG=runs/flagship2/cheetah_entropy_image_100.hdf5

# ---- 0: wait for the session-start bench.py (chip) already in flight ---
# (one chip client at a time — session-10 wedge lesson)
if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
  echo "=== waiting for in-flight bench.py (pid $(cat /tmp/bench.pid)) ==="
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
  echo "=== bench released the chip ==="
fi
touch runs/flagship2/.done_bench_s8  # bench evidence handled at session start

# ---- 1: walker collect (chip SAC + host mujoco) ------------------------
run_watchdog collect_walker "$WK_STATE" 1800 3 \
  python -u collect_dataset.py --env_name walker-walk --num_steps 50000 \
    --seed 0 --output "$WK_STATE"

# walker render starts on the host immediately (parallel with chip work)
if [ -e "$WK_STATE" ] && [ ! -e "$WK_IMG" ]; then
  "${CPUENV[@]}" python -u image_render.py --dataset "$WK_STATE" \
    --env_name walker-walk --imsize 100 --output "$WK_IMG" \
    >> runs/flagship2/render_walker.log 2>&1 &
  WK_RENDER_PID=$!
else
  WK_RENDER_PID=""
fi

# ---- 2: cheetah entropy collect (chip) ---------------------------------
run_watchdog collect_cheetah "$CH_STATE" 1800 3 \
  python -u collect_dataset.py --env_name cheetah-run --num_steps 50000 \
    --target_entropy -3 --seed 0 --output "$CH_STATE"

# cheetah render starts on the host (parallel with the fixed-arm CQL)
if [ -e "$CH_STATE" ] && [ ! -e "$CH_IMG" ]; then
  "${CPUENV[@]}" python -u image_render.py --dataset "$CH_STATE" \
    --env_name cheetah-run --imsize 100 --output "$CH_IMG" \
    >> runs/flagship2/render_cheetah.log 2>&1 &
  CH_RENDER_PID=$!
else
  CH_RENDER_PID=""
fi

# ---- 3: fixed-arm state-CQL rerun (chip; NEVER LANDED — same-dataset
#          Lagrange A/B, session-8 queue stage 8) ------------------------
if [ -e "$CH_STATE" ]; then
  run_watchdog cql_state_fixed_rerun runs/flagship2/.done_cql_state_fixed_rerun \
    1800 3 bash docs/flagship2/run_cql_state_fixed_r4.sh "$CH_STATE"
fi

# renders must be in before multienv; walker augment can start once
# WK_IMG exists (host, parallel with chip stages 4+)
[ -n "$WK_RENDER_PID" ] && { echo "=== waiting walker render ==="; wait "$WK_RENDER_PID" || true; }
[ -n "$CH_RENDER_PID" ] && { echo "=== waiting cheetah render ==="; wait "$CH_RENDER_PID" || true; }
if [ -e "$WK_IMG" ] && [ ! -e "$WK_AUG" ]; then
  "${CPUENV[@]}" python -u state_transition_rollout.py --dataset "$WK_IMG" \
    --output "$WK_AUG" >> runs/flagship2/augment_walker.log 2>&1 &
  WK_AUG_PID=$!
else
  WK_AUG_PID=""
fi

# ---- 4: multienv GAN (chip; NEVER LANDED — VERDICT r3 #6) ---------------
if [ -e "$CH_IMG" ] && [ -e "$WK_IMG" ]; then
  run_watchdog multienv_gan \
    runs/flagship2/multienv_checkpoints/multienv_10.pkl 1800 3 \
    python -u train.py \
      --dataroot "$CH_IMG,$WK_IMG" \
      --env_type multienv --netG s2p --batchSize 16 --bf16 --niter 10 \
      --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 5 \
      --checkpoints_dir runs/flagship2/multienv_checkpoints \
      --log_dir runs/flagship2/multienv_gan_logs \
      --resume_dir runs/flagship2/multienv_gan_ckpt --eval_num 256
else
  echo "=== SKIP multienv_gan (missing rendered dataset(s)) ==="
fi

# ---- 5: walker SLAC (chip) ----------------------------------------------
run_watchdog slac_walker runs/flagship/walker_slac_model/latent.pkl 1800 3 \
  python -u slac_pretrain.py --dataset "$WK_IMG" \
    --save_dir runs/flagship/walker_slac_model --scan_chunk 1000

# ---- 6: walker GAN+R1 (chip, resumable; r1_gamma=1 is the flipped
#          default in cli/train_gan.py now — exercised here) --------------
run_watchdog gan_r1_walker \
  runs/flagship2/walker_r1_checkpoints/walker_30.pkl 1800 4 \
  python -u train.py --dataroot "$WK_IMG" \
    --env_type walker --netG s2p --batchSize 16 --bf16 --niter 30 \
    --scan_chunk 625 --save_epoch_freq 10 \
    --checkpoints_dir runs/flagship2/walker_r1_checkpoints \
    --log_dir runs/flagship2/walker_r1_gan_logs \
    --resume_dir runs/flagship2/walker_r1_gan_ckpt --eval_num 256

[ -n "$WK_AUG_PID" ] && { echo "=== waiting walker augment ==="; wait "$WK_AUG_PID" || true; }

# ---- 7: walker CQL (chip, resumable — protocol-scale run dir for the
#          flag-driven eval features) -------------------------------------
WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_best.pkl
[ -e "$WK_GAN" ] || WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_30.pkl
if [ -e "$WK_GAN" ]; then
  run_watchdog walker_cql runs/flagship2/.done_walker_cql 1800 5 \
    bash docs/flagship2/run_walker_cql.sh "$WK_GAN"
else
  echo "=== SKIP walker_cql (no walker GAN checkpoint) ==="
fi

# ---- 8: framework-feature final evals on the walker CQL run -------------
WK_CQL_RUN=$(ls -dt runs/flagship2/walker_rl_logs/cql_image_walker/cql_* 2>/dev/null | head -1)
if [ -n "$WK_CQL_RUN" ]; then
  run walker_cql_final_eval_best python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot best \
    --n_paths 10 --fallen_threshold 100
  run walker_cql_final_eval_final python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot final \
    --n_paths 10 --fallen_threshold 100
fi

run collect_artifacts bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] SESSION-14 QUEUE COMPLETE ==="
