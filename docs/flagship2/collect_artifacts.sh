#!/usr/bin/env bash
# Copy the round-4 chip-queue outputs into their canonical committed
# locations (docs/flagship2/*.csv — the committed copy takes priority in
# docs/make_results_table.py) and regenerate docs/RESULTS_TABLE.md.
# Safe to run repeatedly; stages that haven't produced output are skipped.
cd /root/repo
set -u

copy_latest() {
  # Merges ALL run-dir fragments of the logical run (stall-resume spawns
  # a fresh run dir holding only post-resume epochs; see
  # merge_progress.py). Falls back to a skip message when nothing
  # matched or every fragment is header-only.
  local glob=$1 dst=$2
  python docs/flagship2/merge_progress.py "$glob" "$dst" \
    || echo "skip (no output yet): $glob"
}

copy_latest "runs/flagship2/cheetah2r1_gan_logs/*/*/progress.csv" \
  docs/flagship2/cheetah2r1_gan_progress.csv
copy_latest "runs/flagship2/walker_r1_gan_logs/*/*/progress.csv" \
  docs/flagship2/walker_r1_gan_progress.csv
copy_latest "runs/flagship2/multienv_gan_logs/*/*/progress.csv" \
  docs/flagship2/multienv_gan_progress.csv
copy_latest "runs/flagship2/rl_logs/cql_state_entropy_lagrange/*/progress.csv" \
  docs/flagship2/cql_state_lagrange_progress.csv
# CPU insurance arm (nice'd, launched while the relay was down): same
# protocol as the chip A/B; collected separately and labeled CPU
copy_latest "runs/flagship2/rl_logs/cql_state_entropy_lagrange_cpu/*/progress.csv" \
  docs/flagship2/cql_state_lagrange_cpu_progress.csv
copy_latest "runs/flagship2/rl_logs/cql_image_entropy_lagrange/*/progress.csv" \
  docs/flagship2/cql_image_lagrange_progress.csv
# fixed-arm rerun on the REGENERATED dataset (session-8 queue stage 8):
# makes the Lagrange A/B same-dataset instead of cross-generation
copy_latest "runs/flagship2/rl_logs/cql_state_entropy_fixed_r4/*/progress.csv" \
  docs/flagship2/cql_state_fixed_r4_progress.csv
copy_latest "runs/flagship2/walker_rl_logs/cql_image_walker/*/progress.csv" \
  docs/flagship2/walker_cql_progress.csv
# session-11 postqueue4: walker IQL rerun on the regenerated dataset
# (same-dataset IQL/CQL pair; r3's walker_iql_progress.csv is kept as
# the round-3 flagship artifact and NOT overwritten)
copy_latest "runs/flagship2/walker_rl_logs/iql_image_walker_flagship/*/progress.csv" \
  docs/flagship2/walker_iql_r4_progress.csv

python docs/make_results_table.py
python docs/compare_lagrange.py --out docs/LAGRANGE_AB.md >/dev/null || true
# round-5 thresh sweep: compare_lagrange REWRITES LAGRANGE_AB.md, so the
# sweep table + verdict are re-appended from their generators each time
python docs/flagship2/lagrange_sweep_report.py >/dev/null 2>&1 || true
cat docs/flagship2/lagrange_sweep_verdict.md >> docs/LAGRANGE_AB.md 2>/dev/null || true
