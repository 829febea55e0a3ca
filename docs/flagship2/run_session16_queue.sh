#!/usr/bin/env bash
# Round-4 session-16 regen queue — the relaunch script for the NEXT VM
# recreation (the session-14 instance keeps running untouched; editing a
# script bash is executing shifts its read offset). Same never-landed-
# first ordering as session 14, with the session-16 review fixes:
#  - helpers come from queue_lib.sh (stall watchdog resets the log mtime
#    per try; success-only done markers)
#  - the SLAC stage's done marker is a sentinel, not latent.pkl (which
#    is written every 5k steps — a relaunch must not consume a partial
#    model; this was the session-10 wedge hazard reintroduced)
#  - stages whose full-protocol results already live in git-tracked
#    docs/ CSVs are skipped outright (fixed-arm CQL rerun, multienv GAN)
#  - the queue records its own pid (echo $$), not a ps-grep guess
# Usage:
#   setsid nohup bash docs/flagship2/run_session16_queue.sh \
#     > runs/flagship2/session16_queue.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p runs/flagship runs/flagship2
echo $$ > /tmp/queue.pid

. docs/flagship2/queue_lib.sh

CPUENV=(env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu)

WK_STATE=runs/flagship/walker_state_50k.hdf5
WK_IMG=runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5
WK_AUG=runs/flagship/walker_augment.hdf5
CH_STATE=runs/flagship2/cheetah_entropy_state_50k.hdf5
CH_IMG=runs/flagship2/cheetah_entropy_image_100.hdf5

# ---- 0: wait for a session-start bench.py (chip) if one is in flight ---
# (one chip client at a time — session-10 wedge lesson)
if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
  echo "=== waiting for in-flight bench.py (pid $(cat /tmp/bench.pid)) ==="
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 30; done
  echo "=== bench released the chip ==="
fi

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

# ---- 2+3: cheetah chain only if the fixed-arm rerun or multienv GAN
#           still need it (both landed in session 16 — the committed
#           CSVs survive recreations) -----------------------------------
NEED_FIXED_ARM=1; NEED_MULTIENV=1
csv_done docs/flagship2/cql_state_fixed_r4_progress.csv 151 && NEED_FIXED_ARM=0
csv_done docs/flagship2/multienv_gan_progress.csv 11 && NEED_MULTIENV=0

CH_RENDER_PID=""
if [ "$NEED_FIXED_ARM" = 1 ] || [ "$NEED_MULTIENV" = 1 ]; then
  run_watchdog collect_cheetah "$CH_STATE" 1800 3 \
    python -u collect_dataset.py --env_name cheetah-run --num_steps 50000 \
      --target_entropy -3 --seed 0 --output "$CH_STATE"
  if [ -e "$CH_STATE" ] && [ ! -e "$CH_IMG" ] && [ "$NEED_MULTIENV" = 1 ]; then
    "${CPUENV[@]}" python -u image_render.py --dataset "$CH_STATE" \
      --env_name cheetah-run --imsize 100 --output "$CH_IMG" \
      >> runs/flagship2/render_cheetah.log 2>&1 &
    CH_RENDER_PID=$!
  fi
  if [ "$NEED_FIXED_ARM" = 1 ] && [ -e "$CH_STATE" ]; then
    run_watchdog cql_state_fixed_rerun \
      runs/flagship2/.done_cql_state_fixed_rerun 1800 3 \
      bash docs/flagship2/run_cql_state_fixed_r4.sh "$CH_STATE"
  else
    echo "=== SKIP cql_state_fixed_rerun (committed CSV is full-protocol) ==="
  fi
else
  echo "=== SKIP cheetah chain (fixed-arm + multienv CSVs committed) ==="
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

# ---- 4: multienv GAN (chip) ---------------------------------------------
if [ "$NEED_MULTIENV" = 1 ] && [ -e "$CH_IMG" ] && [ -e "$WK_IMG" ]; then
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
  echo "=== SKIP multienv_gan (committed CSV or missing datasets) ==="
fi

# ---- 5: walker SLAC (chip; success-only sentinel, NOT latent.pkl) -------
run_watchdog slac_walker runs/flagship/walker_slac_model/.done 1800 3 \
  python -u slac_pretrain.py --dataset "$WK_IMG" \
    --save_dir runs/flagship/walker_slac_model --scan_chunk 1000

# ---- 6: walker GAN+R1 (chip, resumable; r1_gamma=1 default exercised;
#          walker_30.pkl is written only at the final epoch, so it IS a
#          success-only marker) -------------------------------------------
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
echo "=== [$(date -u +%H:%M:%S)] SESSION-16 QUEUE COMPLETE ==="
