#!/usr/bin/env bash
# Round-4 REGENERATION queue. The VM hosting this round was recreated at
# 11:41 UTC with the TPU relay alive but gitignored runs/ wiped — every
# dataset, SLAC model, GAN checkpoint, and RL run dir from rounds 1-3 is
# gone. This queue rebuilds the full pipeline inputs from scratch
# (seeded, same commands as rounds 2-3) and then runs the staged round-4
# chip jobs in VERDICT priority order.
#
# Layout: chip jobs run strictly serially (one v5e via the axon relay —
# no concurrent clients); host-only stages (100px qpos/qvel renders,
# world-model augment) run in TRUE-CPU subshells (axon site dropped from
# PYTHONPATH, PALLAS_AXON_POOL_IPS unset — JAX_PLATFORMS=cpu alone is
# overridden by the axon sitecustomize, see ROUND3_NOTES) backgrounded
# against the concurrent chip stage.
#
# Stages are idempotent: each is skipped when its DONE-marker output
# already exists, so the queue can be relaunched after a failure.
# Usage: setsid nohup bash docs/flagship2/run_regen_queue.sh \
#          > runs/flagship2/regen_queue.log 2>&1 &
cd /root/repo
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p runs/flagship runs/flagship2

# true-CPU env for host-only stages (must not touch the chip while a
# chip job runs): drop the axon site AND the pool IP, then ask for cpu
CPUENV=(env -u PALLAS_AXON_POOL_IPS PYTHONPATH=/root/repo JAX_PLATFORMS=cpu)

run() {  # run <name> <cmd...>: log to its own file, never abort the queue
  local name=$1; shift
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
  bash docs/flagship2/collect_artifacts.sh \
    >> runs/flagship2/collect_artifacts.log 2>&1 || true
}

skip_or_run() {  # skip_or_run <name> <done_path> <cmd...>
  # Skips when <done_path> exists. If the command succeeds and produced
  # no <done_path> itself (marker-file stages), touch it so a relaunch
  # skips the stage.
  local name=$1 done_path=$2; shift 2
  if [ -e "$done_path" ]; then
    echo "=== SKIP $name ($done_path exists) ==="
    return 0
  fi
  echo "=== [$(date -u +%H:%M:%S)] START $name ==="
  if "$@" >> "runs/flagship2/${name}.log" 2>&1; then
    echo "=== [$(date -u +%H:%M:%S)] DONE  $name ==="
    [ -e "$done_path" ] || { mkdir -p "$(dirname "$done_path")"; touch "$done_path"; }
  else
    echo "=== [$(date -u +%H:%M:%S)] FAIL  $name (rc=$?) — continuing ==="
  fi
  bash docs/flagship2/collect_artifacts.sh \
    >> runs/flagship2/collect_artifacts.log 2>&1 || true
}

# ---- stage 0: wait for any already-running bench.py to release the chip
if [ -f /tmp/bench.pid ] && kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; then
  echo "=== waiting for bench.py (pid $(cat /tmp/bench.pid)) ==="
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 20; done
  echo "=== bench.py finished ==="
fi

# ---- A: cheetah (higher-entropy dataset, round-3 recipe) ---------------
CH_STATE=runs/flagship2/cheetah_entropy_state_50k.hdf5
CH_IMG=runs/flagship2/cheetah_entropy_image_100.hdf5
CH_AUG=runs/flagship2/cheetah2_augment.hdf5

skip_or_run collect_cheetah "$CH_STATE" \
  python -u collect_dataset.py --env_name cheetah-run --num_steps 50000 \
    --target_entropy -3 --seed 0 --output "$CH_STATE"

# host chain (true CPU, backgrounded): 100px render -> world-model augment
if [ ! -e "$CH_AUG" ]; then
  (
    if [ ! -e "$CH_IMG" ]; then
      "${CPUENV[@]}" python -u image_render.py --dataset "$CH_STATE" \
        --env_name cheetah-run --imsize 100 --output "$CH_IMG" \
        >> runs/flagship2/render_cheetah.log 2>&1
    fi
    "${CPUENV[@]}" python -u state_transition_rollout.py --dataset "$CH_IMG" \
      --output "$CH_AUG" >> runs/flagship2/augment_cheetah.log 2>&1
  ) &
  CH_HOST_PID=$!
else
  CH_HOST_PID=""
fi

# chip: the CQL-Lagrange A/B (VERDICT #1c) — needs only the state dataset
skip_or_run cql_state_lagrange \
  runs/flagship2/.done_cql_state_lagrange \
  bash docs/flagship2/run_cql_state_lagrange.sh

[ -n "${CH_HOST_PID}" ] && { echo "=== waiting cheetah render/augment ==="; wait "$CH_HOST_PID"; }

# chip: SLAC 300k on the entropy image dataset
skip_or_run slac_cheetah runs/flagship2/cheetah2_slac_model \
  bash docs/flagship2/run_cheetah2_pipeline.sh slac

# chip: GAN + lazy-R1 at the reference protocol (the R1-default A/B;
# compare vs the committed no-R1 CSV docs/flagship2/cheetah2_gan_progress.csv)
skip_or_run gan_r1_cheetah runs/flagship2/cheetah2r1_checkpoints/cheetah2r1_30.pkl \
  bash docs/flagship2/run_cheetah2_pipeline.sh gan_r1

# ---- B: walker (round-2 flagship recipe, default entropy) --------------
WK_STATE=runs/flagship/walker_state_50k.hdf5
WK_IMG=runs/flagship/walker_image_dataset_stack3_imgsize_100.hdf5
WK_AUG=runs/flagship/walker_augment.hdf5

skip_or_run collect_walker "$WK_STATE" \
  python -u collect_dataset.py --env_name walker-walk --num_steps 50000 \
    --seed 0 --output "$WK_STATE"

if [ ! -e "$WK_AUG" ]; then
  (
    if [ ! -e "$WK_IMG" ]; then
      "${CPUENV[@]}" python -u image_render.py --dataset "$WK_STATE" \
        --env_name walker-walk --imsize 100 --output "$WK_IMG" \
        >> runs/flagship2/render_walker.log 2>&1
    fi
    "${CPUENV[@]}" python -u state_transition_rollout.py --dataset "$WK_IMG" \
      --output "$WK_AUG" >> runs/flagship2/augment_walker.log 2>&1
  ) &
  WK_HOST_PID=$!
else
  WK_HOST_PID=""
fi

# chip: image-CQL full protocol with Lagrange (VERDICT #2 — the
# late-collapse fix); uses the best-PSNR GAN checkpoint if exported
CH_GAN_BEST=runs/flagship2/cheetah2r1_checkpoints/cheetah2r1_best.pkl
CH_GAN=${CH_GAN_BEST}
[ -e "$CH_GAN" ] || CH_GAN=runs/flagship2/cheetah2r1_checkpoints/cheetah2r1_30.pkl
if [ -e "$CH_GAN" ]; then
  GAN_CKPT="$CH_GAN" skip_or_run cql_image_lagrange \
    runs/flagship2/.done_cql_image_lagrange \
    bash docs/flagship2/run_cql_image_lagrange.sh
else
  echo "=== SKIP cql_image_lagrange (no cheetah2r1 GAN checkpoint) ==="
fi

[ -n "${WK_HOST_PID}" ] && { echo "=== waiting walker render/augment ==="; wait "$WK_HOST_PID"; }

# chip: walker SLAC
skip_or_run slac_walker runs/flagship/walker_slac_model \
  python -u slac_pretrain.py --dataset "$WK_IMG" \
    --save_dir runs/flagship/walker_slac_model --scan_chunk 1000

# chip: walker GAN + R1 (round-3 flagship recipe)
skip_or_run gan_r1_walker runs/flagship2/walker_r1_checkpoints/walker_30.pkl \
  python -u train.py --dataroot "$WK_IMG" \
    --env_type walker --netG s2p --batchSize 16 --bf16 --niter 30 \
    --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 10 \
    --checkpoints_dir runs/flagship2/walker_r1_checkpoints \
    --log_dir runs/flagship2/walker_r1_gan_logs \
    --resume_dir runs/flagship2/walker_r1_gan_ckpt --eval_num 256

# chip: walker CQL leg (completes the 2x2 env x algo matrix)
WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_best.pkl
[ -e "$WK_GAN" ] || WK_GAN=runs/flagship2/walker_r1_checkpoints/walker_30.pkl
if [ -e "$WK_GAN" ]; then
  skip_or_run walker_cql runs/flagship2/.done_walker_cql \
    bash docs/flagship2/run_walker_cql.sh "$WK_GAN"
else
  echo "=== SKIP walker_cql (no walker GAN checkpoint) ==="
fi

# chip: full-res multi-env GAN (entropy cheetah + walker; the original
# round-1 cheetah dataset is not being regenerated — the entropy dataset
# is this round's canonical cheetah dataset)
skip_or_run multienv_gan runs/flagship2/multienv_checkpoints/multienv_10.pkl \
  python -u train.py \
  --dataroot "$CH_IMG,$WK_IMG" \
  --env_type multienv --netG s2p --batchSize 16 --bf16 --niter 10 \
  --r1_gamma 1 --scan_chunk 625 --save_epoch_freq 5 \
  --checkpoints_dir runs/flagship2/multienv_checkpoints \
  --log_dir runs/flagship2/multienv_gan_logs \
  --resume_dir runs/flagship2/multienv_gan_ckpt --eval_num 256

# framework-feature final evals on this round's walker CQL run
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
echo "=== [$(date -u +%H:%M:%S)] REGEN QUEUE COMPLETE ==="
