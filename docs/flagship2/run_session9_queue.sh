#!/usr/bin/env bash
# Round-4 session-9/10 queue — run_session8_queue.sh with the review
# fixes, for RELAUNCHES after a VM recreation or stage failure (the
# session-8 copy was already executing when the fixes landed, so it was
# left untouched; use THIS script from now on). Fixes vs session 8:
#   - skip_or_run marks a stage done ONLY on success. The old version
#     touched the done-marker unconditionally, so a failed collect
#     created an EMPTY walker_state_50k.hdf5 that every relaunch then
#     skipped, cascading the whole walker chain.
#   - run()/skip_or_run propagate the command's exit code.
#   - The final-eval stage picks the NEWEST walker-CQL run dir (ls -dt);
#     watchdog relaunches create one timestamped dir per attempt and the
#     old `ls -d | head -1` evaluated the oldest (wedged) one.
#   - Stage 8 calls run_cql_state_fixed_r4.sh (single source of truth)
#     instead of an inline copy of the arm's 9-flag protocol.
# Stage list, budgets, and watchdog semantics are unchanged — see the
# session-8 header. Usage:
#   setsid nohup bash docs/flagship2/run_session9_queue.sh \
#     > runs/flagship2/session9_queue.log 2>&1 &
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
  # mark done ONLY on success — a failure must leave the stage
  # re-runnable (and must not fabricate an empty output file)
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

# ---- 1: walker collect (chip SAC + host mujoco) ------------------------
skip_or_run collect_walker "$WK_STATE" \
  python -u collect_dataset.py --env_name walker-walk --num_steps 50000 \
    --seed 0 --output "$WK_STATE"

# ---- 2: walker render (host) || bench (chip) ---------------------------
if [ -e "$WK_STATE" ] && [ ! -e "$WK_IMG" ]; then
  "${CPUENV[@]}" python -u image_render.py --dataset "$WK_STATE" \
    --env_name walker-walk --imsize 100 --output "$WK_IMG" \
    >> runs/flagship2/render_walker.log 2>&1 &
  WK_RENDER_PID=$!
else
  WK_RENDER_PID=""
fi
skip_or_run bench_s8 runs/flagship2/.done_bench_s8 python -u bench.py
[ -n "$WK_RENDER_PID" ] && { echo "=== waiting walker render ==="; wait "$WK_RENDER_PID" || true; }

# ---- 3: walker augment (host, bg) || walker SLAC (chip) ----------------
if [ -e "$WK_IMG" ] && [ ! -e "$WK_AUG" ]; then
  "${CPUENV[@]}" python -u state_transition_rollout.py --dataset "$WK_IMG" \
    --output "$WK_AUG" >> runs/flagship2/augment_walker.log 2>&1 &
  WK_AUG_PID=$!
else
  WK_AUG_PID=""
fi
skip_or_run slac_walker runs/flagship/walker_slac_model \
  python -u slac_pretrain.py --dataset "$WK_IMG" \
    --save_dir runs/flagship/walker_slac_model --scan_chunk 1000

# ---- 4: walker GAN+R1 (chip, resumable) --------------------------------
run_watchdog gan_r1_walker \
  runs/flagship2/walker_r1_checkpoints/walker_30.pkl 1800 4 \
  python -u train.py --dataroot "$WK_IMG" \
    --env_type walker --netG s2p --batchSize 16 --bf16 --niter 30 \
    --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 10 \
    --checkpoints_dir runs/flagship2/walker_r1_checkpoints \
    --log_dir runs/flagship2/walker_r1_gan_logs \
    --resume_dir runs/flagship2/walker_r1_gan_ckpt --eval_num 256

[ -n "$WK_AUG_PID" ] && { echo "=== waiting walker augment ==="; wait "$WK_AUG_PID" || true; }

# ---- 5: walker CQL (chip, resumable — the VERDICT #3 leg) --------------
WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_best.pkl
[ -e "$WK_GAN" ] || WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_30.pkl
if [ -e "$WK_GAN" ]; then
  run_watchdog walker_cql runs/flagship2/.done_walker_cql 1800 5 \
    bash docs/flagship2/run_walker_cql.sh "$WK_GAN"
else
  echo "=== SKIP walker_cql (no walker GAN checkpoint) ==="
fi

# ---- 6: framework-feature final evals on the walker CQL run ------------
# NEWEST run dir: watchdog relaunches create one timestamped dir per try
WK_CQL_RUN=$(ls -dt runs/flagship2/walker_rl_logs/cql_image_walker/cql_* 2>/dev/null | head -1)
if [ -n "$WK_CQL_RUN" ]; then
  run walker_cql_final_eval_best python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot best \
    --n_paths 10 --fallen_threshold 100
  run walker_cql_final_eval_final python -m s2p_tpu.cli.final_eval \
    --run_dir "$WK_CQL_RUN" --env_name walker-walk --snapshot final \
    --n_paths 10 --fallen_threshold 100
fi

# ---- 7: cheetah entropy collect ----------------------------------------
skip_or_run collect_cheetah "$CH_STATE" \
  python -u collect_dataset.py --env_name cheetah-run --num_steps 50000 \
    --target_entropy -3 --seed 0 --output "$CH_STATE"

# ---- 8: cheetah render (host, bg) || fixed-arm state-CQL (chip) --------
if [ -e "$CH_STATE" ] && [ ! -e "$CH_IMG" ]; then
  "${CPUENV[@]}" python -u image_render.py --dataset "$CH_STATE" \
    --env_name cheetah-run --imsize 100 --output "$CH_IMG" \
    >> runs/flagship2/render_cheetah.log 2>&1 &
  CH_RENDER_PID=$!
else
  CH_RENDER_PID=""
fi
if [ -e "$CH_STATE" ]; then
  skip_or_run cql_state_fixed_rerun runs/flagship2/.done_cql_state_fixed_rerun \
    bash docs/flagship2/run_cql_state_fixed_r4.sh "$CH_STATE"
fi
[ -n "$CH_RENDER_PID" ] && { echo "=== waiting cheetah render ==="; wait "$CH_RENDER_PID" || true; }

# ---- 9: multienv GAN (chip, resumable) ---------------------------------
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

run collect_artifacts bash docs/flagship2/collect_artifacts.sh
echo "=== [$(date -u +%H:%M:%S)] SESSION-8 QUEUE COMPLETE ==="
